#!/usr/bin/env python3
"""Synthesize an sf1 testdata directory from the driver's sf0.1 by
replicating every non-dim table `factor` times with consistent key
shifts — measurement tooling only (like local_verify.py), used for the
COVERAGE.md scaling appendix's sf0.1 → sf1 decade. The driver generates
only sf{0.001,0.01,0.1}; replication preserves every per-row
distribution (text lengths, word mixes, value ranges, dup rates within
each replica) exactly while multiplying cardinalities, which is what a
scaling measurement needs. Foreign keys shift in lockstep
(orders.o_custkey with customer, lineitem with orders/part/supplier) so
join selectivities are unchanged. Document texts get one extra
replica-tag word so cross-replica rows are not exact duplicates (10
identical copies of every near-dup cluster would blow the LSH
hot-bucket caps and MEASURE less verify work, not more data).

Usage: python3 scripts/make_sf1.py [src_dir] [dst_dir] [factor]
Defaults: /root/testdata/sf0.1  /dev/shm/graft_sf1  10
"""
import os, sys
import duckdb


def main(src="/root/testdata/sf0.1", dst="/dev/shm/graft_sf1", factor=10):
    factor = int(factor)
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()

    def reps(select_with_i):
        return " UNION ALL ".join(
            select_with_i.format(i=i) for i in range(factor))

    def write(name, sql):
        out = f"{dst}/{name}.parquet"
        con.execute(
            f"COPY ({sql}) TO '{out}' (FORMAT PARQUET, ROW_GROUP_SIZE 1000000)")
        n = con.execute(f"SELECT count(*) FROM '{out}'").fetchone()[0]
        print(f"{name}: {n} rows")

    def t(name):
        return f"'{src}/{name}.parquet'"

    # fixed dims: copy as-is (nation/region do not scale in TPC-H either)
    for dim in ("nation", "region"):
        write(dim, f"SELECT * FROM {t(dim)}")

    # strides = exact per-table max keys of the source, so shifted ranges
    # are disjoint and foreign keys stay dense in their dimension
    def mx(table, col):
        return con.execute(
            f"SELECT max({col}) FROM {t(table)}").fetchone()[0]

    ck, sk, pk = mx("customer", "c_custkey"), mx("supplier", "s_suppkey"), \
        mx("part", "p_partkey")
    ok = mx("orders", "o_orderkey")
    ev, uv = mx("events", "event_id"), mx("events", "user_id")
    dk, vk = mx("documents", "doc_id"), mx("embeddings", "vec_id")

    write("customer", reps(
        f"SELECT c_custkey + {{i}} * {ck} AS c_custkey, c_name, c_nationkey,"
        f" c_acctbal, c_mktsegment FROM {t('customer')}"))
    write("supplier", reps(
        f"SELECT s_suppkey + {{i}} * {sk} AS s_suppkey, s_name, s_nationkey,"
        f" s_acctbal FROM {t('supplier')}"))
    write("part", reps(
        f"SELECT p_partkey + {{i}} * {pk} AS p_partkey, p_name, p_brand,"
        f" p_type, p_size, p_retailprice FROM {t('part')}"))
    write("orders", reps(
        f"SELECT o_orderkey + {{i}} * {ok} AS o_orderkey,"
        f" o_custkey + {{i}} * {ck} AS o_custkey, o_orderstatus,"
        f" o_totalprice, o_orderdate, o_orderpriority FROM {t('orders')}"))
    write("lineitem", reps(
        f"SELECT l_orderkey + {{i}} * {ok} AS l_orderkey,"
        f" l_partkey + {{i}} * {pk} AS l_partkey,"
        f" l_suppkey + {{i}} * {sk} AS l_suppkey, l_linenumber, l_quantity,"
        f" l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,"
        f" l_shipdate FROM {t('lineitem')}"))
    write("events", reps(
        f"SELECT event_id + {{i}} * {ev} AS event_id, ts,"
        f" user_id + {{i}} * {uv} AS user_id, event_type, value, props"
        f" FROM {t('events')}"))
    write("documents", reps(
        f"SELECT doc_id + {{i}} * {dk} AS doc_id,"
        f" text || ' zzrep{{i}}' AS text, lang, source,"
        f" n_chars + {len(' zzrepN')} AS n_chars FROM {t('documents')}"))
    write("embeddings", reps(
        f"SELECT vec_id + {{i}} * {vk} AS vec_id, embedding, label"
        f" FROM {t('embeddings')}"))


if __name__ == "__main__":
    main(*sys.argv[1:4])
