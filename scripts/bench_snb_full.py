"""Full-schema SNB benchmark at SF1-equivalent scale (VERDICT r2 item 6).

LDBC's generator output is not bundled and the environment has no egress,
so this synthesizes the COMPLETE SNB schema the reference's snb tests use
(reference data/SNB0.003/schema.sql; test/sql/snb/snb.test:13-54 property
graph: 9 vertex tables + 9 edge tables) with LDBC-like distributions:
power-law knows (RMAT), zipf-ish message authorship and forum membership,
reply trees biased to popular roots, and the Organisation typemask
discriminator (university=1, company=2) the inheritance tests rely on.

It then runs the reference's own SNB query SHAPES at that scale:
  IC2   friend's recent messages (knows + hasAuthor join, date filter)
  IC13  ANY SHORTEST knows path between two persons (batched -> pairs/s)
  IS3   friends of a person (knows neighborhood)
  IS5   message author lookup
  IS7   replies of a message (two-pattern MATCH with shared bindings)
  BI17  date-filtered undirected knows triangle (bi.test:56-60)
  2HOP  bounded 2-hop MATCH binding count (north-star rows/s)

Env: BENCH_SF (1 default; scales persons/knows), BENCH_MESSAGES,
BENCH_MEMBERS, BENCH_SOURCES, DUCKPGQ_DEVICE_REL=1 for the device
relational backend. Prints one JSON line per metric.
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

FIRST = ["Ali", "Jan", "Maria", "Chen", "Otto", "Ivan", "Ana", "Jun",
         "Karl", "Lena", "Omar", "Sara", "Tom", "Wei", "Yara", "Zoe"]
LAST = ["Abouba", "Smith", "Garcia", "Li", "Weber", "Petrov", "Silva",
        "Sato", "Novak", "Kumar", "Hassan", "Berg", "Jones", "Wang"]

DAY_MS = 86_400_000
EPOCH_2010 = 1262304000000  # 2010-01-01 in millis


def _ts(rng, n, start=EPOCH_2010, span_days=1000):
    return (start + rng.integers(0, span_days * DAY_MS, size=n)).astype(
        np.int64)


def build_dataset(sf: float, n_messages: int, n_members: int, rng):
    """Return {table: (names, columns-as-python-lists)} for the full SNB
    schema (only the tables the reference's property graph binds)."""
    from duckpgq_tpu.utils.rmat import rmat_edges

    P = int(10600 * sf)
    K_target = int(180000 * sf)
    F = int(30000 * sf)
    T = 16080
    TC = 71
    N_UNI, N_COMP = 1575, 6380
    O = N_UNI + N_COMP
    N_CITY, N_COUNTRY = 1343, 111

    data = {}

    # ---- vertices ----------------------------------------------------
    pid = np.arange(P, dtype=np.int64) * 100 + 933  # sparse LDBC-ish ids
    data["Person"] = (
        ["creationDate", "id", "firstName", "lastName", "gender",
         "birthday", "locationIP", "browserUsed", "LocationCityId",
         "language", "email"],
        [_ts(rng, P).tolist(), pid.tolist(),
         [FIRST[i % len(FIRST)] for i in range(P)],
         [LAST[(i * 7) % len(LAST)] for i in range(P)],
         ["male" if i % 2 else "female" for i in range(P)],
         (np.int64(3000) + rng.integers(0, 9000, size=P)).tolist(),
         [f"77.245.{i % 256}.{(i * 3) % 256}" for i in range(P)],
         ["Firefox" if i % 3 else "Chrome" for i in range(P)],
         rng.integers(0, N_CITY, size=P).astype(np.int64).tolist(),
         ["en" for _ in range(P)],
         [f"p{i}@snb.org" for i in range(P)]],
    )
    fid = np.arange(F, dtype=np.int64) * 10 + 7
    data["Forum"] = (
        ["creationDate", "id", "title", "ModeratorPersonId"],
        [_ts(rng, F).tolist(), fid.tolist(),
         [f"Wall of p{i % P}" for i in range(F)],
         pid[rng.integers(0, P, size=F)].tolist()],
    )
    tid = np.arange(T, dtype=np.int64)
    data["Tag"] = (
        ["id", "name", "url", "TypeTagClassId"],
        [tid.tolist(), [f"tag{i}" for i in range(T)],
         [f"http://t/{i}" for i in range(T)],
         rng.integers(0, TC, size=T).astype(np.int64).tolist()],
    )
    data["TagClass"] = (
        ["id", "name", "url", "SubclassOfTagClassId"],
        [list(range(TC)), [f"class{i}" for i in range(TC)],
         [f"http://tc/{i}" for i in range(TC)],
         [None] + [int(i // 2) for i in range(1, TC)]],
    )
    oid = np.arange(O, dtype=np.int64)
    data["Organisation"] = (
        ["id", "type", "name", "url", "LocationPlaceId", "typemask"],
        [oid.tolist(),
         ["University" if i < N_UNI else "Company" for i in range(O)],
         [f"org{i}" for i in range(O)],
         [f"http://o/{i}" for i in range(O)],
         rng.integers(0, N_CITY, size=O).astype(np.int64).tolist(),
         [1 if i < N_UNI else 2 for i in range(O)]],
    )
    cityid = np.arange(N_CITY, dtype=np.int64)
    data["City"] = (
        ["id", "name", "url", "type", "PartOfPlaceId"],
        [cityid.tolist(), [f"city{i}" for i in range(N_CITY)],
         [f"http://c/{i}" for i in range(N_CITY)],
         ["City"] * N_CITY,
         (N_CITY + rng.integers(0, N_COUNTRY, size=N_CITY)).astype(
             np.int64).tolist()],
    )
    countryid = np.arange(N_COUNTRY, dtype=np.int64) + N_CITY
    data["Country"] = (
        ["id", "name", "url", "type", "PartOfPlaceId"],
        [countryid.tolist(), [f"country{i}" for i in range(N_COUNTRY)],
         [f"http://n/{i}" for i in range(N_COUNTRY)],
         ["Country"] * N_COUNTRY,
         [None] * N_COUNTRY],
    )
    data["Place"] = (
        ["id", "name", "url", "type", "PartOfPlaceId"],
        [data["City"][1][0] + data["Country"][1][0],
         data["City"][1][1] + data["Country"][1][1],
         data["City"][1][2] + data["Country"][1][2],
         data["City"][1][3] + data["Country"][1][3],
         data["City"][1][4] + data["Country"][1][4]],
    )

    # messages: 35% posts (some photos), 65% comments replying to a
    # popularity-biased earlier message
    M = n_messages
    mid = np.arange(M, dtype=np.int64) * 10 + 618475290624
    creator = (P * (rng.random(M) ** 2.2)).astype(np.int64).clip(0, P - 1)
    is_comment = np.arange(M) >= int(M * 0.35)
    parent_idx = (rng.random(M) ** 2 * np.maximum(
        np.arange(M), 1)).astype(np.int64)
    parent = np.where(is_comment, mid[parent_idx], -1)
    is_photo = (~is_comment) & (rng.random(M) < 0.3)
    mdate = np.sort(_ts(rng, M))  # ids ascending in time like LDBC
    data["Message"] = (
        ["creationDate", "id", "imageFile", "locationIP", "browserUsed",
         "language", "content", "length", "CreatorPersonId",
         "LocationCountryId", "ParentMessageId"],
        [mdate.tolist(), mid.tolist(),
         [f"photo{m}.jpg" if p else None
          for m, p in zip(mid.tolist(), is_photo.tolist())],
         [f"77.245.0.{i % 256}" for i in range(M)],
         ["Firefox"] * M,
         ["en"] * M,
         [None if p else f"msg {i}" for i, p in enumerate(is_photo.tolist())],
         rng.integers(3, 180, size=M).astype(np.int64).tolist(),
         pid[creator].tolist(),
         rng.integers(N_CITY, N_CITY + N_COUNTRY, size=M).astype(
             np.int64).tolist(),
         [int(p) if p >= 0 else None for p in parent.tolist()]],
    )

    # ---- edges -------------------------------------------------------
    scale = int(np.ceil(np.log2(max(P, 2))))
    src, dst = rmat_edges(scale, max(4 * K_target // (1 << scale), 1),
                          seed=7)
    keep = (src < P) & (dst < P) & (src != dst)
    src, dst = src[keep], dst[keep]
    # LDBC knows is one row per unordered friend pair — dedupe the RMAT
    # sample the same way (duplicate pairs would also change triangle
    # binding multiplicities vs the real workload)
    lo, hi = np.minimum(src, dst), np.maximum(src, dst)
    _, first = np.unique(lo * np.int64(P) + hi, return_index=True)
    first.sort()
    src, dst = src[first][:K_target], dst[first][:K_target]
    data["Person_knows_person"] = (
        ["creationDate", "Person1Id", "Person2Id"],
        [_ts(rng, len(src), start=EPOCH_2010 + 365 * DAY_MS,
             span_days=900).tolist(),
         pid[src].tolist(), pid[dst].tolist()],
    )
    data["Message_hasAuthor_Person"] = (
        ["creationDate", "messageId", "PersonId"],
        [mdate.tolist(), mid.tolist(), pid[creator].tolist()],
    )
    cm = np.flatnonzero(is_comment)
    data["Message_replyOf_Message"] = (
        ["creationDate", "messageId", "ParentMessageId"],
        [mdate[cm].tolist(), mid[cm].tolist(), parent[cm].tolist()],
    )
    HM = n_members
    mem_forum = (F * (rng.random(HM) ** 2.5)).astype(np.int64).clip(0, F - 1)
    mem_person = rng.integers(0, P, size=HM)
    data["Forum_hasMember_Person"] = (
        ["creationDate", "ForumId", "PersonId"],
        [_ts(rng, HM).tolist(), fid[mem_forum].tolist(),
         pid[mem_person].tolist()],
    )
    FHT = F * 2
    data["Forum_hasTag_Tag"] = (
        ["creationDate", "ForumId", "TagId"],
        [_ts(rng, FHT).tolist(),
         fid[rng.integers(0, F, size=FHT)].tolist(),
         rng.integers(0, T, size=FHT).astype(np.int64).tolist()],
    )
    PHI = P * 8
    data["Person_hasInterest_Tag"] = (
        ["creationDate", "PersonId", "TagId"],
        [_ts(rng, PHI).tolist(),
         pid[rng.integers(0, P, size=PHI)].tolist(),
         (T * (rng.random(PHI) ** 2)).astype(np.int64).clip(
             0, T - 1).tolist()],
    )
    WO = P
    data["person_workAt_Organisation"] = (
        ["creationDate", "PersonId", "OrganisationId", "workFrom"],
        [_ts(rng, WO).tolist(), pid[rng.integers(0, P, size=WO)].tolist(),
         rng.integers(0, O, size=WO).astype(np.int64).tolist(),
         rng.integers(1999, 2013, size=WO).astype(np.int64).tolist()],
    )
    LM = min(M, int(600000 * sf))
    data["Person_likes_Message"] = (
        ["creationDate", "PersonId", "id"],
        [_ts(rng, LM).tolist(), pid[rng.integers(0, P, size=LM)].tolist(),
         mid[(M * (rng.random(LM) ** 2)).astype(np.int64).clip(
             0, M - 1)].tolist()],
    )
    MHT = int(M * 0.6)
    data["Message_hasTag_Tag"] = (
        ["creationDate", "id", "TagId"],
        [_ts(rng, MHT).tolist(),
         mid[rng.integers(0, M, size=MHT)].tolist(),
         rng.integers(0, T, size=MHT).astype(np.int64).tolist()],
    )
    return data, pid, mid


PG_DDL = """
CREATE PROPERTY GRAPH snb
VERTEX TABLES (
    Person LABEL Person,
    Forum LABEL Forum,
    Organisation LABEL Organisation IN typemask(company, university),
    Place LABEL Place,
    Tag LABEL Tag,
    TagClass LABEL TagClass,
    Country LABEL Country,
    City LABEL City,
    Message LABEL Message
    )
EDGE TABLES (
    Person_knows_person     SOURCE KEY (Person1Id) REFERENCES Person (id)
                            DESTINATION KEY (Person2Id) REFERENCES Person (id)
                            LABEL Knows,
    Forum_hasMember_Person  SOURCE KEY (ForumId) REFERENCES Forum (id)
                            DESTINATION KEY (PersonId) REFERENCES Person (id)
                            LABEL hasMember,
    Forum_hasTag_Tag        SOURCE KEY (ForumId) REFERENCES Forum (id)
                            DESTINATION KEY (TagId) REFERENCES Tag (id)
                            LABEL Forum_hasTag,
    Person_hasInterest_Tag  SOURCE KEY (PersonId) REFERENCES Person (id)
                            DESTINATION KEY (TagId) REFERENCES Tag (id)
                            LABEL hasInterest,
    person_workAt_Organisation SOURCE KEY (PersonId) REFERENCES Person (id)
                               DESTINATION KEY (OrganisationId) REFERENCES Organisation (id)
                               LABEL workAt_Organisation,
    Person_likes_Message    SOURCE KEY (PersonId) REFERENCES Person (id)
                            DESTINATION KEY (id) REFERENCES Message (id)
                            LABEL likes_Message,
    Message_hasTag_Tag      SOURCE KEY (id) REFERENCES Message (id)
                            DESTINATION KEY (TagId) REFERENCES Tag (id)
                            LABEL message_hasTag,
    Message_hasAuthor_Person    SOURCE KEY (messageId) REFERENCES Message (id)
                                DESTINATION KEY (PersonId) REFERENCES Person (id)
                                LABEL hasAuthor,
    Message_replyOf_Message SOURCE KEY (messageId) REFERENCES Message (id)
                            DESTINATION KEY (ParentMessageId) REFERENCES Message (id)
                            LABEL replyOf
    )
"""

TYPES = {
    "creationDate": "TIMESTAMP_MS", "id": "BIGINT", "firstName": "VARCHAR",
    "lastName": "VARCHAR", "gender": "VARCHAR", "birthday": "DATE",
    "locationIP": "VARCHAR", "browserUsed": "VARCHAR",
    "LocationCityId": "BIGINT", "language": "VARCHAR", "email": "VARCHAR",
    "title": "VARCHAR", "ModeratorPersonId": "BIGINT", "name": "VARCHAR",
    "url": "VARCHAR", "TypeTagClassId": "BIGINT",
    "SubclassOfTagClassId": "BIGINT", "type": "VARCHAR",
    "LocationPlaceId": "BIGINT", "typemask": "INTEGER",
    "PartOfPlaceId": "BIGINT", "imageFile": "VARCHAR",
    "content": "VARCHAR", "length": "BIGINT", "CreatorPersonId": "BIGINT",
    "LocationCountryId": "BIGINT", "ParentMessageId": "BIGINT",
    "Person1Id": "BIGINT", "Person2Id": "BIGINT", "messageId": "BIGINT",
    "PersonId": "BIGINT", "ForumId": "BIGINT", "TagId": "BIGINT",
    "OrganisationId": "BIGINT", "workFrom": "BIGINT",
}


def load(con, data):
    """Bulk-load generated columns straight into engine tables."""
    from duckpgq_tpu.storage.table import ColumnDefinition, DataTable
    from duckpgq_tpu.storage.vector import Vector
    from duckpgq_tpu.types import type_from_name
    for tname, (names, cols) in data.items():
        cdefs = [ColumnDefinition(c, type_from_name(TYPES[c]))
                 for c in names]
        table = DataTable(tname, cdefs)
        table.append([Vector.from_values(vals, cdefs[i].type)
                      for i, vals in enumerate(cols)])
        con.catalog.create_table(table)


def emit(metric, value, unit, **detail):
    print(json.dumps({"metric": metric, "value": value, "unit": unit,
                      "detail": detail}))


def main():
    if os.environ.get("BENCH_REL_DEVICE", "cpu") == "cpu":
        import jax
        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            pass
    import duckpgq_tpu

    sf = float(os.environ.get("BENCH_SF", "1"))
    n_messages = int(os.environ.get("BENCH_MESSAGES", str(int(1200000 * sf))))
    n_members = int(os.environ.get("BENCH_MEMBERS", str(int(1000000 * sf))))
    rng = np.random.default_rng(99)

    t0 = time.time()
    data, pid, mid = build_dataset(sf, n_messages, n_members, rng)
    gen_s = time.time() - t0
    con = duckpgq_tpu.connect()
    t0 = time.time()
    load(con, data)
    con.execute(PG_DDL)
    load_s = time.time() - t0
    total_rows = sum(len(cols[0]) for _, cols in data.values())
    print(f"# SNB SF{sf:g} full schema: {len(data)} tables, "
          f"{total_rows} rows (messages={n_messages}); gen {gen_s:.1f}s, "
          f"load {load_s:.1f}s", file=sys.stderr)
    emit("snb_full_load_rows_per_s", round(total_rows / load_s, 1),
         "rows/s", tables=len(data), rows=total_rows)

    # hub = a top-degree person, so the IS/IC neighborhood queries have
    # non-trivial result sets (LDBC parameters pick "active" persons too)
    hub = int(con.execute(
        "SELECT Person1Id FROM (SELECT Person1Id, count(*) c FROM "
        "Person_knows_person GROUP BY Person1Id) ORDER BY c DESC, "
        "Person1Id LIMIT 1").fetchall()[0][0])
    msg = int(mid[len(mid) // 2])

    # IS3: friends of a person (snb.test IS3 shape)
    q = (f"FROM GRAPH_TABLE (snb MATCH (a:person WHERE a.id = {hub})"
         f"-[k:knows]-(b:person) COLUMNS (b.id, b.firstName, b.lastName, "
         f"k.creationDate)) tmp ORDER BY creationDate DESC, id ASC")
    t0 = time.time(); rows = con.execute(q).fetchall()
    emit("snb_full_is3_latency_ms", round((time.time() - t0) * 1e3, 1),
         "ms", rows=len(rows))

    # IC2: recent messages of friends (snb.test IC2 shape)
    q = (f"FROM GRAPH_TABLE (snb MATCH (a:Person WHERE a.id = {hub})"
         f"-[k:knows]-(b:Person)<-[au:hasAuthor]-(m:message WHERE "
         f"m.creationDate < '2012-06-01') COLUMNS (a.id, b.id AS bid, "
         f"m.id AS messageId, coalesce(m.imageFile, m.content), "
         f"m.creationDate)) tmp ORDER BY creationDate DESC, Messageid ASC "
         f"LIMIT 20")
    t0 = time.time(); rows = con.execute(q).fetchall()
    emit("snb_full_ic2_latency_ms", round((time.time() - t0) * 1e3, 1),
         "ms", rows=len(rows))

    # IS5 message author
    q = (f"FROM GRAPH_TABLE (snb MATCH (m:message where m.id = {msg})"
         f"-[au:hasAuthor]->(p:person) COLUMNS (p.id, p.firstName, "
         f"p.lastName)) tmp")
    t0 = time.time(); rows = con.execute(q).fetchall()
    emit("snb_full_is5_latency_ms", round((time.time() - t0) * 1e3, 1),
         "ms", rows=len(rows))

    # IS7 replies (two-pattern MATCH, snb_inheritance IS7 shape)
    parent = None
    r = con.execute(
        "SELECT ParentMessageId, count(*) c FROM Message WHERE "
        "ParentMessageId IS NOT NULL GROUP BY ParentMessageId "
        "ORDER BY c DESC, ParentMessageId LIMIT 1").fetchall()
    parent = int(r[0][0])
    q = (f"FROM GRAPH_TABLE (snb MATCH (replyAuthor:person)<-[au2:hasAuthor]"
         f"-(c:message where c.ParentMessageId is not null)-[r:replyOf]->"
         f"(m:message where m.id = {parent})-[au:hasAuthor]->"
         f"(messageAuthor:person), (replyAuthor:person)-[k:knows]-"
         f"(messageAuthor:person) COLUMNS (c.id, c.content, c.creationDate, "
         f"replyAuthor.id, replyAuthor.firstName, replyAuthor.lastName)) "
         f"tmp ORDER BY tmp.content")
    t0 = time.time(); rows = con.execute(q).fetchall()
    emit("snb_full_is7_latency_ms", round((time.time() - t0) * 1e3, 1),
         "ms", rows=len(rows))

    # IC13: batched ANY SHORTEST between persons -> pairs/s
    n_src = int(os.environ.get("BENCH_SOURCES", "4"))
    srcs = ", ".join(str(int(pid[i])) for i in
                     rng.integers(0, len(pid), size=n_src))
    q = (f"SELECT count(*) FROM GRAPH_TABLE (snb MATCH p = ANY SHORTEST "
         f"(a:Person WHERE a.id IN ({srcs}))-[k:knows]->{{1,4}}(b:Person) "
         f"COLUMNS (a.id AS aid, b.id AS bid, path_length(p) AS len)) t")
    pairs = n_src * len(pid)
    t0 = time.time(); rows = con.execute(q).fetchall()
    dt = time.time() - t0
    emit("snb_full_ic13_pairs_per_s", round(pairs / dt, 1), "pairs/s",
         pairs=pairs, reached=int(rows[0][0]), seconds=round(dt, 2))

    # 2-hop binding (north-star rows/s)
    lim = int(pid[max(len(pid) // 10, 1)])
    q = (f"SELECT count(*) FROM GRAPH_TABLE (snb MATCH (a:Person)"
         f"-[k1:Knows]->(b:Person)-[k2:Knows]->(c:Person) WHERE "
         f"a.id <> c.id AND a.id < {lim} COLUMNS (a.id AS aid, "
         f"c.id AS cid)) t")
    t0 = time.time(); rows = con.execute(q).fetchall()
    dt = time.time() - t0
    emit("snb_full_2hop_rows_per_s", round(rows[0][0] / dt, 1), "rows/s",
         bindings=int(rows[0][0]), seconds=round(dt, 2))

    # BI17-shape triangle with date-filtered undirected knows (bi.test)
    q = ("SELECT count(*) FROM GRAPH_TABLE (snb MATCH (personA:Person)"
         "-[kAB:Knows where kAB.creationDate BETWEEN '2012-10-04' AND "
         "'2013-01-16']-(personB:Person)-[kBC:Knows where kBC.creationDate "
         "BETWEEN '2012-10-04' AND '2013-01-16']-(personC:Person)"
         "-[kCA:Knows where kCA.creationDate BETWEEN '2012-10-04' AND "
         "'2013-01-16']-(personA:Person) COLUMNS (personA.id AS aid)) t")
    t0 = time.time(); rows = con.execute(q).fetchall()
    dt = time.time() - t0
    emit("snb_full_bi17_triangles_per_s", round(rows[0][0] / max(dt, 1e-9), 1),
         "rows/s", triangles=int(rows[0][0]), seconds=round(dt, 2))


if __name__ == "__main__":
    main()
