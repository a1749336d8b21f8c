#!/usr/bin/env python3
"""Build a bench-only ~sf1 dataset by 10x key-shifted replication of
the driver's sf0.1 parquet (no sf1 testdata exists; this is for
wall-clock scaling measurements ONLY, never for correctness oracles).

Each replica r (0..9) shifts every join key by r * stride, with the
SAME stride used on both sides of each key (orders.o_custkey and
customer.c_custkey, etc.), so join fan-outs match the base dataset and
per-key group sizes stay constant — the scaling is in ROW COUNT, not
in skew. Date/timestamp columns are left untouched: the engine's
bounded-calendar design assumption (daily collapses stay <= ~2400
rows) is exactly what an sf sweep should hold fixed. Strides are
powers of ten well above each key's max, so modulo-based fold/carve
assignments (l_orderkey % 5, doc_id % 97) keep their distribution.

Usage: python3 tools/make_sf1.py [outdir]   (default /tmp/sf1)
"""
import sys, os
import duckdb

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
REPLICAS = 10

OKEY, CKEY, PKEY, SKEY = 1_000_000, 100_000, 100_000, 10_000
DKEY, VKEY, EKEY, UKEY = 10_000, 10_000, 1_000_000, 1_000_000

# table -> list of (column, stride); unlisted columns pass through.
SHIFTS = {
    "customer": [("c_custkey", CKEY)],
    "supplier": [("s_suppkey", SKEY)],
    "part": [("p_partkey", PKEY)],
    "orders": [("o_orderkey", OKEY), ("o_custkey", CKEY)],
    "lineitem": [("l_orderkey", OKEY), ("l_partkey", PKEY),
                 ("l_suppkey", SKEY)],
    "events": [("event_id", EKEY), ("user_id", UKEY)],
    "documents": [("doc_id", DKEY)],
    "embeddings": [("vec_id", VKEY)],
    "nation": [],   # fixed dims: copied once, not replicated
    "region": [],
}


# Replica-identical text/vectors would make every doc a 10-way exact
# duplicate: LSH buckets then hold 10 copies each and candidate-pair
# counts grow x100, not x10 — a fixture artifact, not a scaling truth.
# Rotating word order (documents) and vector elements (embeddings) by
# the replica index preserves lengths, vocabulary, token counts and
# norm distributions while decorrelating replicas, so each replica
# carries its OWN copy of the base near-dup families and dedup scales
# linearly in family count — the honest sf sweep semantics.
PERTURB = {
    # Word ROTATION is not enough: it preserves nearly every n-gram, so
    # replicas stay 0.99-Jaccard near-dups and dedup candidate pairs
    # still grow x100 (measured: x_dedup_ngram_jaccard x16.7 under
    # rotation). A deterministic hash-keyed word PERMUTATION destroys
    # adjacency (trigram sets ~disjoint across replicas) while keeping
    # the unigram multiset and char count exact.
    "documents": {
        "text": ("CASE WHEN r.r = 0 THEN text ELSE array_to_string("
                 "list_transform(list_sort(list_transform("
                 "range(1, len(string_split(text, ' ')) + 1), "
                 "i -> {'k': (i + r.r * 1000003) * 2654435761 % 4294967296,"
                 " 'v': string_split(text, ' ')[i]})), s -> s.v), ' ') "
                 "END AS text"),
    },
    "embeddings": {
        "embedding": ("CASE WHEN r.r = 0 THEN embedding ELSE "
                      "list_concat(embedding[r.r * 3 + 1:], "
                      "embedding[1:r.r * 3])::FLOAT[] END AS embedding"),
    },
}


def main():
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    for t, shifts in SHIFTS.items():
        src = f"{SRC}/{t}.parquet"
        dst = f"{OUT}/{t}.parquet"
        cols = [r[0] for r in
                con.execute(f"DESCRIBE SELECT * FROM '{src}'").fetchall()]
        if not shifts:
            con.execute(
                f"COPY (SELECT * FROM '{src}') TO '{dst}' (FORMAT PARQUET)")
        else:
            smap = dict(shifts)
            pmap = PERTURB.get(t, {})
            sel = ", ".join(
                f"{c} + r.r * {smap[c]} AS {c}" if c in smap
                else pmap.get(c, c)
                for c in cols)
            con.execute(
                f"COPY (SELECT {sel} FROM '{src}', "
                f"range(0, {REPLICAS}) r(r)) "
                f"TO '{dst}' (FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM '{dst}'").fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()
