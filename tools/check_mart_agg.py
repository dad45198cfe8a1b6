#!/usr/bin/env python3
"""Dev-only off-floor mart differential for rungs whose FULL row-level
oracle is infeasible (vendas_mart at sf30 is 180 M rows; the row-level
canon in check_oracle.py sorts rows in Python and cannot hold that).

Compares GROUPED CHECKSUMS instead: the same aggregation — count,
distinct customers, and the sums of every money column, grouped by
(CATEGORIA_PRODUTO, SEGMENTO_CLIENTE) — computed by DuckDB twice, once
over the Spark result parquet written by `graft.Verify`, once over the
oracle SQL run against the raw tables. Per-row values are rounded to
4 dp on BOTH sides already (the oracle contract), so the grouped sums
are sums of identical multisets and may differ only by summation
order: counts must match exactly, sums within rel 1e-9.

Usage:
  python3 tools/check_mart_agg.py <verify_out_dir> <sf_dir> [query]
(query defaults to vendas_mart; q_vendas_mart_bucketed shares the
schema and is accepted.)
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

MONEY = ["VALOR_VENDA", "VALOR_DESCONTO", "VALOR_CLICK", "VALOR_ERROR",
         "VALOR_PURCHASE", "VALOR_SIGNUP", "VALOR_VIEW"]


def agg_sql(src):
    sums = ", ".join(f'sum("{c}") AS s_{c.lower()}' for c in MONEY)
    return (f'SELECT "CATEGORIA_PRODUTO", "SEGMENTO_CLIENTE", '
            f'count(*) AS n, count(DISTINCT "ID_CLIENTE") AS nc, {sums} '
            f'FROM {src} GROUP BY 1, 2 ORDER BY 1, 2')


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    query = sys.argv[3] if len(sys.argv) > 3 else "vendas_mart"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)[query]
    got = con.execute(
        agg_sql(f"read_parquet('{out_dir}/{query}/*.parquet')")).fetchall()
    exp = con.execute(agg_sql(f"({oracle})")).fetchall()
    if len(got) != len(exp):
        print(f"FAIL {query}: groups spark={len(got)} oracle={len(exp)}")
        sys.exit(1)
    bad = 0
    for g, e in zip(got, exp):
        # group keys + two counts: exact; money sums: rel 1e-9
        if g[:4] != e[:4]:
            print(f"FAIL group/count: spark={g[:4]} oracle={e[:4]}")
            bad += 1
            continue
        for c, (a, b) in zip(MONEY, zip(g[4:], e[4:])):
            if a is None and b is None:
                continue
            if a is None or b is None or \
                    abs(a - b) > 1e-9 * max(1.0, abs(a), abs(b)):
                print(f"FAIL {g[0]}/{g[1]} {c}: spark={a} oracle={b}")
                bad += 1
    if bad:
        print(f"== FAIL: {bad} mismatches over {len(got)} groups ==")
        sys.exit(1)
    tot = sum(g[2] for g in got)
    print(f"OK   {query}: {len(got)} groups, {tot} rows, "
          f"counts exact, {len(MONEY)} sums within rel 1e-9")


if __name__ == "__main__":
    main()
