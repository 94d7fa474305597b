#!/usr/bin/env python3
"""DuckDB-side pin for the sk_kmv oracle SQL (pairs with KmvFixtureSpec).

The r5 driver gate flagged sk_kmv with a one-cell hash mismatch that no
local engine pair reproduced; the oracle SQL was rewritten long-hand for
engine-version portability. This fixture certifies, on whatever DuckDB
is installed:

  1. the SHIPPED oracle SQL (read from a Verify dump's oracle_sql.json)
     on the same planted corpus KmvFixtureSpec uses, against the same
     hand-computed integers;
  2. the oracle's (a - mod(a,b))/b division spelling against pinned
     big-int quotients;
  3. the oracle's 12-term strpos hex parse against pinned values.

Usage: python3 tools/kmv_fixture.py <verify_out_dir_with_oracle_sql.json>
"""
import json
import sys
import tempfile

import duckdb

EXPECTED = [("both", 50, 48), ("purchase", 130, 111), ("view", 150, 168)]
DIV_CASES = [
    (17732923532771328, 1056964608, 16777216),
    (17732923532771328, 281474976710656, 63),
    (17732923532771328, 3, 5910974510923776),
    (17732923532771328, 1234567890123, 14363),
    (88664617663856640, 70368744177664, 1260),
]
HEX_CASES = [
    ("000000000000", 0),
    ("ffffffffffff", 281474976710655),
    ("9e107d9d372b", 173793664120619),
    ("0123456789ab", 1250999896491),
]


def main(verify_dir: str) -> None:
    sql = json.load(open(f"{verify_dir}/oracle_sql.json"))["sk_kmv"]
    con = duckdb.connect()

    # 1. full oracle on the planted corpus (one day; view=1..150,
    #    purchase=101..230 -> all rows take the estimator branch)
    with tempfile.TemporaryDirectory() as d:
        con.execute(
            """CREATE TABLE ev AS
               SELECT CAST(u + CASE WHEN et = 'purchase' THEN 1000 ELSE 0 END
                           AS BIGINT) AS event_id,
                      TIMESTAMP '2024-03-15 12:00:00' AS ts,
                      CAST(u AS BIGINT) AS user_id, et AS event_type,
                      1.0 AS value, '{}' AS props
               FROM (SELECT range AS u FROM range(1, 151)), (VALUES ('view')) t(et)
               UNION ALL
               SELECT CAST(u + 1000 AS BIGINT), TIMESTAMP '2024-03-15 12:00:00',
                      CAST(u AS BIGINT), 'purchase', 1.0, '{}'
               FROM range(101, 231) r(u)"""
        )
        con.execute(f"COPY ev TO '{d}/events.parquet' (FORMAT PARQUET)")
        con.execute(f"CREATE VIEW events AS SELECT * FROM '{d}/events.parquet'")
        got = [(r[0], int(r[1]), int(r[2])) for r in con.execute(sql).fetchall()]
        assert got == EXPECTED, f"oracle on planted corpus: {got} != {EXPECTED}"

    # 2. division spelling
    for a, b, want in DIV_CASES:
        (q,) = con.execute(
            f"SELECT CAST((({a}) - mod(({a}), ({b}))) / ({b}) AS BIGINT)"
        ).fetchone()
        assert int(q) == want, f"idiv({a},{b}) = {q} != {want}"

    # 3. hex parse, spelled exactly as Approx.skKmvSql spells it (the
    #    planted-corpus case above already runs the SHIPPED text; this
    #    isolates the parse on edge values the corpus can't hit). Guard
    #    that the shipped oracle still uses this spelling at all:
    assert sql.count("strpos('0123456789abcdef'") == 36, \
        "oracle no longer spells the 12-term strpos parse x3 sketches"
    frag = " + ".join(
        f"(strpos('0123456789abcdef', substr(h, {j}, 1)) - 1)"
        f" * CAST({16 ** (12 - j)} AS BIGINT)"
        for j in range(1, 13))
    for h, want in HEX_CASES:
        (q,) = con.execute(
            f"SELECT {frag} FROM (VALUES ('{h}')) t(h)"
        ).fetchone()
        assert int(q) == want, f"hex48({h}) = {q} != {want}"

    print("kmv_fixture: all pins green "
          f"(duckdb {duckdb.__version__}; oracle corpus + "
          f"{len(DIV_CASES)} div + {len(HEX_CASES)} hex cases)")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/v_r6a")
