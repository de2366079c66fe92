#!/usr/bin/env python3
"""Generate sf1 testdata (10x sf0.1) for memory-pressure/spill benching.

Usage: python3 tools/gen_sf1.py [src_dir] [out_dir] [factor] [boiler_n]
       defaults: /root/testdata/sf0.1  /tmp/sf1  10  0

boiler_n > 0 additionally plants that many EXACT copies of one
distinct-vocabulary boilerplate document (doc_ids from 900000000) —
the bucket-df cap-stress variant (VERDICT r12 item 8): a dup group
larger than DefaultBucketDfCap=1000 saturates all of its LSH buckets,
the capped join drops it wholesale, and the g25 recall census must
report exactly C(boiler_n, 2) lost pairs. The baseline sf1 sweep uses
boiler_n = 0; mirror of Dedup.plantBoilerplate.

The driver's testdata stops at sf0.1; the 20x ScaleDemo replicates rows
in-memory, which stresses candidate DENSITY but not CARDINALITY growth
(vocab, LSH buckets, distinct users/keys) — the dimension that creates
memory pressure and shuffle spill at a real 10x. This generator scales
sf0.1 by `factor` with ORGANIC growth, fully deterministic (md5-keyed
jitter, no RNG state, no seed dependence on execution order):

- region/nation: fixed dims, copied verbatim (TPC-H convention).
- customer/supplier/part: `factor` copies with key-space offsets
  (copy i's keys live at key + i*ceil), names rewritten to the new key,
  acctbal/price jittered by a deterministic sub-unit hash delta.
- copy i=0 is byte-identical to the source everywhere (every jitter —
  values, dates, tokens, embedding epsilons — is guarded on i > 0), so
  the output is a strict superset of the input and base-vs-scaled
  row-level comparisons are valid (ADVICE r12).
- orders/lineitem: copies reference copy-LOCAL dimension keys, so join
  fan-out per key stays constant while key cardinality grows 10x;
  dates shift i days (calendar stays ~fixed — the documented design
  point: day-bounded ops stay |days|^2, not row^2).
- events: 10x users over the same calendar (user_id offset, ts +i
  minutes, value jittered in cents) — per-user history length is
  preserved, user cardinality grows.
- documents: 10x docs; copy i>0 mutates ~10% of tokens (md5-chosen per
  (token, copy)) by appending a copy suffix -> vocab, shingle and LSH
  bucket cardinality grow organically; cross-copy docs remain near-dups
  (Jaccard ~0.8) so the dedup family sees organic clique growth too.
  n_chars is recomputed from the mutated text.
- embeddings: 10x vectors; each component nudged by a deterministic
  per-(vec,copy,dim) epsilon < 1e-3 -> neighborhoods preserved, vector
  cardinality grows.

Output is one parquet per table, same schemas as the driver's testdata.
"""
import sys, os
import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
F = int(sys.argv[3]) if len(sys.argv) > 3 else 10
# comma-list plants several groups: "2000,400" -> group 0 of 2000 docs
# (vocab boilerplate_probe_token_*, offset 900000000 — identical to the
# single-int form) and group 1 of 400 docs (per-group vocab
# boilerplate_probe_g1_token_*, offset 940000000). Disjoint vocab per
# group, so planted buckets never intersect across groups or with the
# organic corpus and each group's census contribution is exact. Group
# offsets step by 40M because g25/g30 re-key their %5 exact-copy probes
# at doc_id + RecallProbeOffset (10M): a 10M step would land group g's
# ids exactly on group g-1's probe copies, giving 80 doc_ids two texts
# and corrupting both groups' census contribution (measured: the first
# dense run's g25 captured_pairs was off by exactly C(80,2)).
#
# A trailing 'u' ("2000u,400u") plants the same doc COUNT at the same
# ids but with a UNIQUE 12-token vocabulary per doc — the CONTROL
# corpus for tools/dense_census.py: identical document cardinality
# (hence identical derived-cap budgets, which grow with n_docs) and
# zero planted index mass (df-1 keys are outside every histogram), so
# the dense-vs-control census deltas are purely the planted duplicate
# structure. (Comparing dense against the PLAIN organic corpus instead
# is off by a budget boundary: the planted docs raise n_docs, which
# re-admits organic df levels just over the organic cap — measured at
# sf1 as +24 captured pairs in the winnow lane when its aug cap moved
# 82 -> 84.)
BOILER_SPECS = sys.argv[4].split(",") if len(sys.argv) > 4 else []
BOILER_N = int(BOILER_SPECS[0].rstrip("u")) if BOILER_SPECS else 0

os.makedirs(OUT, exist_ok=True)
con = duckdb.connect()

def src(t):
    return f"read_parquet('{SRC}/{t}.parquet')"

def sink(t, sql):
    con.sql(f"COPY ({sql}) TO '{OUT}/{t}.parquet' (FORMAT PARQUET)")
    n = con.sql(f"SELECT count(*) FROM '{OUT}/{t}.parquet'").fetchone()[0]
    print(f"[gen_sf1] {t}: {n} rows")

# deterministic jitter in [0, 1): md5 of a salted key
def h01(*exprs):
    key = " || ':' || ".join(f"CAST({e} AS VARCHAR)" for e in exprs)
    return f"(('0x' || substr(md5({key}), 1, 8))::BIGINT % 1000000) / 1000000.0"

# centered jitter in (-0.5, 0.5), applied to copies i>0 ONLY: copy 0 stays
# byte-identical to the source (like the documents token mutation), so sf1
# is a strict superset of sf0.1 and base-vs-scaled row-level comparison
# works (ADVICE r12)
def jit(*exprs):
    return f"(CASE WHEN i > 0 THEN {h01(*exprs)} - 0.5 ELSE 0 END)"

copies = f"(SELECT unnest(range(0, {F})) AS i) cp"

# fixed dims
for t in ("region", "nation"):
    sink(t, f"SELECT * FROM {src(t)}")

# key ceilings (offset step per copy)
KC = con.sql(f"SELECT max(c_custkey) + 1 FROM {src('customer')}").fetchone()[0]
KS = con.sql(f"SELECT max(s_suppkey) + 1 FROM {src('supplier')}").fetchone()[0]
KP = con.sql(f"SELECT max(p_partkey) + 1 FROM {src('part')}").fetchone()[0]
KO = con.sql(f"SELECT max(o_orderkey) + 1 FROM {src('orders')}").fetchone()[0]
KE = con.sql(f"SELECT max(event_id) + 1 FROM {src('events')}").fetchone()[0]
KU = con.sql(f"SELECT max(user_id) + 1 FROM {src('events')}").fetchone()[0]
KD = con.sql(f"SELECT max(doc_id) + 1 FROM {src('documents')}").fetchone()[0]
KV = con.sql(f"SELECT max(vec_id) + 1 FROM {src('embeddings')}").fetchone()[0]

sink("customer", f"""
  SELECT c_custkey + i * {KC} AS c_custkey,
         'Customer#' || lpad(CAST(c_custkey + i * {KC} AS VARCHAR), 9, '0') AS c_name,
         c_nationkey,
         round(c_acctbal + {jit('c_custkey', 'i', "'cb'")}, 2) AS c_acctbal,
         c_mktsegment
  FROM {src('customer')} CROSS JOIN {copies}""")

sink("supplier", f"""
  SELECT s_suppkey + i * {KS} AS s_suppkey,
         'Supplier#' || lpad(CAST(s_suppkey + i * {KS} AS VARCHAR), 9, '0') AS s_name,
         s_nationkey,
         round(s_acctbal + {jit('s_suppkey', 'i', "'sb'")}, 2) AS s_acctbal
  FROM {src('supplier')} CROSS JOIN {copies}""")

sink("part", f"""
  SELECT p_partkey + i * {KP} AS p_partkey,
         p_name, p_brand, p_type, p_size,
         round(p_retailprice + {jit('p_partkey', 'i', "'pp'")}, 2) AS p_retailprice
  FROM {src('part')} CROSS JOIN {copies}""")

sink("orders", f"""
  SELECT o_orderkey + i * {KO} AS o_orderkey,
         o_custkey + i * {KC} AS o_custkey,
         o_orderstatus,
         round(o_totalprice + {jit('o_orderkey', 'i', "'ot'")}, 2) AS o_totalprice,
         o_orderdate + to_days(CAST(i AS INTEGER)) AS o_orderdate,
         o_orderpriority
  FROM {src('orders')} CROSS JOIN {copies}""")

sink("lineitem", f"""
  SELECT l_orderkey + i * {KO} AS l_orderkey,
         l_partkey + i * {KP} AS l_partkey,
         l_suppkey + i * {KS} AS l_suppkey,
         l_linenumber, l_quantity,
         round(l_extendedprice + {jit('l_orderkey', 'l_linenumber', 'i', "'lp'")}, 2) AS l_extendedprice,
         l_discount, l_tax, l_returnflag, l_linestatus,
         l_shipdate + to_days(CAST(i AS INTEGER)) AS l_shipdate
  FROM {src('lineitem')} CROSS JOIN {copies}""")

sink("events", f"""
  SELECT event_id + i * {KE} AS event_id,
         ts + to_minutes(CAST(i AS INTEGER)) AS ts,
         user_id + i * {KU} AS user_id,
         event_type,
         round(value + {jit('event_id', 'i', "'ev'")}, 2) AS value,
         props
  FROM {src('events')} CROSS JOIN {copies}""")

# documents: copy i>0 mutates ~10% of tokens (chosen by md5(token, i))
# by appending '_<i>' — vocab and shingle space grow, near-dup structure
# across copies is preserved (~0.8 Jaccard to the original).
# boilerplate: exact copies of one disjoint-vocab doc (cap-stress)
boiler_sql = ""
for g, spec in enumerate(BOILER_SPECS):
    bn = int(spec.rstrip("u"))
    if bn <= 0:
        continue
    if spec.endswith("u"):
        # unique per-doc vocab: zero shared shingles/buckets/fps
        btext = " || ' ' || ".join(
            f"'bp_g{g}_d' || u.i || '_t{j}'" for j in range(1, 13))
        text_expr, nch = f"({btext})", f"CAST(length({btext}) AS BIGINT)"
    else:
        tok = ("boilerplate_probe_token" if g == 0
               else f"boilerplate_probe_g{g}_token")
        bt = " ".join(f"{tok}_{i}" for i in range(1, 13))
        text_expr, nch = f"'{bt}'", f"CAST({len(bt)} AS BIGINT)"
    boiler_sql += f"""
  UNION ALL
  SELECT {900000000 + g * 40000000} + u.i AS doc_id, {text_expr} AS text,
         'xx' AS lang, 'probe' AS source, {nch} AS n_chars
  FROM (SELECT unnest(range(0, {bn})) AS i) u"""

sink("documents", f"""
  WITH toks AS (
    SELECT doc_id, i,
           list_transform(
             string_split_regex(text, '[ \t\n\r\f]+'),
             t -> CASE WHEN i > 0 AND t <> ''
                        AND ('0x' || substr(md5(t || ':' || CAST(i AS VARCHAR)), 1, 8))::BIGINT % 10 = 0
                  THEN t || '_' || CAST(i AS VARCHAR) ELSE t END) AS tl,
           lang, source
    FROM {src('documents')} CROSS JOIN {copies})
  SELECT doc_id + i * {KD} AS doc_id,
         list_aggregate(tl, 'string_agg', ' ') AS text,
         lang, source,
         CAST(length(list_aggregate(tl, 'string_agg', ' ')) AS BIGINT) AS n_chars
  FROM toks{boiler_sql}""")

sink("embeddings", f"""
  SELECT vec_id + i * {KV} AS vec_id,
         CAST(list_transform(
           list_zip(embedding, range(1, len(embedding) + 1)),
           z -> z[1] + CASE WHEN i > 0
                  THEN CAST(('0x' || substr(md5(CAST(vec_id AS VARCHAR) || ':' ||
                       CAST(i AS VARCHAR) || ':' || CAST(z[2] AS VARCHAR)), 1, 6))::BIGINT
                       % 1000 AS FLOAT) / 1000000.0 - 0.0005
                  ELSE 0 END) AS FLOAT[]) AS embedding,
         label
  FROM {src('embeddings')} CROSS JOIN {copies}""")

print(f"[gen_sf1] done -> {OUT} (factor {F} from {SRC})")
