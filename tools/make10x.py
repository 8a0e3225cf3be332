#!/usr/bin/env python3
"""Builder-side 10x dataset replicator (the round-3 probe fixture, rebuilt).

Replicates the sf0.1 tables 10x with shifted keys into an output dir, so
the same binaries can be timed at 10x the data volume. Replication model =
"more entities, not longer histories": every entity key (user, customer,
order, doc, vector) shifts per replica so per-key series/doc sizes stay
constant — the realistic way a corpus grows 10x.

Similarity stays non-degenerate: replica r>0 documents get per-replica
token prefixes (every token becomes rN<tok>), preserving within-replica
near-dup structure exactly while killing cross-replica shingle overlap
(otherwise every doc gains 9 exact twins and pair queries go quadratic).
Embeddings get a deterministic per-replica perturbation + renormalize for
the same reason. Dimension tables (region/nation/part/supplier) are NOT
replicated — dims grow far slower than facts, and the broadcast-join
shape under test depends on exactly that.

Usage: make10x.py <srcSfDir> <outDir> [replicas=10]
"""
import os
import sys

import duckdb


def main(src, out, k=10):
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute("SET threads TO 16")

    def copy(sql, table, multi=False):
        # facts get split into ~4MB files: a single big file caps a Spark
        # scan at ONE task (maxPartitionBytes=128MB), which reads as fake
        # superlinear growth in the probe; real warehouses have many files
        opts = ", FILE_SIZE_BYTES '4MB'" if multi else ""
        con.execute(
            f"COPY ({sql}) TO '{out}/{table}.parquet' (FORMAT PARQUET{opts})")
        glob = f"'{out}/{table}.parquet/*.parquet'" if multi \
            else f"'{out}/{table}.parquet'"
        n = con.execute(f"SELECT count(*) FROM {glob}").fetchone()[0]
        print(f"{table}: {n} rows")

    def src_t(t):
        return f"'{src}/{t}.parquet'"

    # dims: straight copies
    for t in ["region", "nation", "part", "supplier"]:
        copy(f"SELECT * FROM {src_t(t)}", t)

    r = f"(SELECT unnest(range({k})) AS r)"
    maxes = {}
    for t, key in [("customer", "c_custkey"), ("orders", "o_orderkey"),
                   ("events", "event_id"), ("events_u", "user_id"),
                   ("documents", "doc_id"), ("embeddings", "vec_id")]:
        tbl = "events" if t == "events_u" else t
        maxes[key] = con.execute(
            f"SELECT max({key}) + 1 FROM {src_t(tbl)}").fetchone()[0]

    copy(f"""SELECT c_custkey + r * {maxes['c_custkey']} AS c_custkey,
               c_name, c_nationkey, c_acctbal, c_mktsegment
             FROM {src_t('customer')} CROSS JOIN {r}""", "customer", multi=True)
    copy(f"""SELECT o_orderkey + r * {maxes['o_orderkey']} AS o_orderkey,
               o_custkey + r * {maxes['c_custkey']} AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
             FROM {src_t('orders')} CROSS JOIN {r}""", "orders", multi=True)
    copy(f"""SELECT l_orderkey + r * {maxes['o_orderkey']} AS l_orderkey,
               l_partkey, l_suppkey, l_linenumber, l_quantity,
               l_extendedprice, l_discount, l_tax, l_returnflag,
               l_linestatus, l_shipdate
             FROM {src_t('lineitem')} CROSS JOIN {r}""", "lineitem", multi=True)
    copy(f"""SELECT event_id + r * {maxes['event_id']} AS event_id, ts,
               user_id + r * {maxes['user_id']} AS user_id,
               event_type, value, props
             FROM {src_t('events')} CROSS JOIN {r}""", "events", multi=True)
    copy(f"""SELECT doc_id + r * {maxes['doc_id']} AS doc_id,
               CASE WHEN r = 0 THEN text ELSE array_to_string(
                 list_transform(string_split(text, ' '),
                   t -> 'r' || CAST(r AS VARCHAR) || t), ' ') END AS text,
               lang, source, n_chars
             FROM {src_t('documents')} CROSS JOIN {r}""", "documents", multi=True)
    # perturb + renormalize so replicas are not exact cosine twins
    copy(f"""WITH p AS (
               SELECT vec_id + r * {maxes['vec_id']} AS vec_id,
                 list_transform(list_zip(embedding,
                     range(1, len(embedding) + 1)), z ->
                   CAST(z[1] + 0.05 * r * sin(vec_id * 7.13 + z[2] * 1.77)
                     AS FLOAT)) AS e,
                 label
               FROM {src_t('embeddings')} CROSS JOIN {r})
             SELECT vec_id,
               list_transform(e, x -> CAST(x / sqrt(list_sum(
                 list_transform(e, y -> y * y))) AS FLOAT)) AS embedding,
               label
             FROM p""", "embeddings", multi=True)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2],
         int(sys.argv[3]) if len(sys.argv) > 3 else 10)
