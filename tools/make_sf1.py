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
powers of ten well above each key's max, so a modulo-based fold/carve
assignment keeps its distribution when its modulus divides the stride
(l_orderkey % 5 with stride 1e6 does; a % 97 carve would NOT — the
one such carve, the round-9 eval split, was replaced by pinned literal
id lists in round 10, so none remain).

Two document-perturbation modes:

  default      hash-keyed word PERMUTATION per replica (see PERTURB):
               decorrelates replicas but keeps the base 31-word
               vocabulary, so the trigram universe SATURATES (~28k
               types) and trigram df grows x10 — the inverted-index
               dedup tier's documented ADVERSARIAL case (quadratic
               inside the df-cap window; BENCH_NOTES round 10).
  --heaps      per-replica VOCABULARY RENAMING (see HEAPS_TEXT): word
               order kept, a deterministic ~80% of the vocabulary gets
               a replica-unique suffix ('z' x r — distinct length =>
               distinct wordHash per replica), ~20% stays shared. The
               trigram universe then GROWS with the corpus (Heaps-law
               regime: only all-shared-word trigrams — ~(0.2)^3 of
               occurrences — accumulate cross-replica df), within-
               replica near-dup families are preserved exactly (the
               renaming is a vocabulary bijection applied uniformly),
               and the inverted-index cost Sum C(df,2) scales ~x10 =
               linear. This is the fixture that matches how real
               corpora behave; the default stays as the stress case.

Round 12 additions (the sf10 canary-first demo):

  --replicas=N Replica count (default 10 = ~sf1; 100 = ~sf10). With
               --heaps and N > 10 the per-replica renaming switches
               from the suffix scheme ('z' * r — O(N) char growth) to
               the INFIX marker scheme (replica char + '~' inserted
               after the word's first two chars, '~' * (r // 26)
               appended — see HEAPS_TEXT_INFIX): still a per-replica
               vocabulary bijection, still a distinct wordHash per
               replica (the replica char sits INSIDE the
               first-3-chars window, the tail varies length), at
               +2 chars per renamed word + 1 per 26 replicas.
               N <= 10 keeps the round-11 scheme EXACTLY so sf1h
               fixtures stay reproducible.
  --tables=a,b Only build the listed tables (the canary demo needs
               documents + events; building 100x lineitem for a
               4-query go/no-go read would be fixture theater).
  --embhonest  Embedding-analog of --heaps (round-11 verdict ask): the
               default embedding perturbation ROTATES elements by the
               replica index, and rotation replicas of one structured
               corpus CONCENTRATE sign-LSH buckets (any fixed
               hyperplane set sees a rotation family as near-collinear
               projections — measured: SrpSizingProbe recall plateaus
               ~0.38 at sf1h however wide the bands). This mode instead
               multiplies each dimension by a deterministic per-replica
               ±1 SIGN PATTERN: norms, within-replica geometry, and
               clone cosines are preserved EXACTLY (sign flips are an
               isometry applied uniformly per replica), while a fixed
               hyperplane h sees replica r as the projection of the
               base vector onto h∘s_r — a fresh effective hyperplane
               per replica — so bucket density stays FLAT as the corpus
               grows: the honest regime for banded sign-LSH.

Usage: python3 tools/make_sf1.py [outdir] [--heaps]   (default /tmp/sf1)
"""
import sys, os
import duckdb

SRC = "/root/testdata/sf0.1"
HEAPS = "--heaps" in sys.argv
EMBHONEST = "--embhonest" in sys.argv
ARGS = [a for a in sys.argv[1:] if not a.startswith("--")]
OUT = ARGS[0] if ARGS else ("/tmp/sf1h" if HEAPS else "/tmp/sf1")
REPLICAS = 10
for a in sys.argv[1:]:
    if a.startswith("--replicas="):
        REPLICAS = int(a.split("=", 1)[1])
ONLY = None
for a in sys.argv[1:]:
    if a.startswith("--tables="):
        ONLY = set(a.split("=", 1)[1].split(","))

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
        # rotation amount mod 64 (the dim count) so replica counts
        # past 21 don't slice beyond the array; r.r*3 % 64 = 0 only at
        # r = 0 below 64 replicas (gcd(3, 64) = 1)
        "embedding": ("CASE WHEN r.r * 3 % 64 = 0 THEN embedding ELSE "
                      "list_concat(embedding[r.r * 3 % 64 + 1:], "
                      "embedding[1:r.r * 3 % 64])::FLOAT[] END AS embedding"),
    },
}

# --heaps: replica-unique renaming of a deterministic ~80% of the
# vocabulary (hash(t) % 5 != 0), word order kept, so every replica's
# renamed vocabulary is disjoint from every other's (in the STRING
# universe and under the engine's first-3-chars+length wordHash).
#   N <= 10 (the round-11 sf1h fixture, kept byte-reproducible):
#     suffix 'z' * r — distinct length => distinct wordHash.
#   N > 10 (sf10+): INFIX marker — insert chr(97 + r % 26) + '~'
#     after the word's first TWO chars, plus '~' * (r // 26) at the
#     end. The round-13 PREFIX variant (base26(r) + '~' prepended)
#     was string-disjoint but COLLAPSED in the engine's hash
#     universe (ADVICE r13): wordHash reads only the first 3 chars
#     + length, so every renamed word in a replica shared the
#     3-char marker window and equal-length distinct originals
#     collided — the hashed-trigram vocabulary x_heaps_profile
#     counts stopped growing with replicas, the opposite of what
#     the fixture exists to demonstrate. The infix keeps the
#     word's OWN first two chars in the hash window: window =
#     (t1, t2, replica char), so within-replica distinctness
#     matches the base corpus's own (first2, length) classes
#     (the 31-word base vocabulary is fully distinct there —
#     measured), and replicas differ in the window char (r % 26)
#     or in length (the '~' tail, r // 26) — pairwise disjoint
#     hashes for ANY replica count. String universe: '~' is always
#     present and never occurs in the base corpus (lowercase +
#     space only — asserted post-build per scheme), so
#     renamed ∩ kept = ∅ and the fixed-position insertion is
#     injective — within-replica word identity (and therefore
#     shingle structure) is preserved exactly. Cost: +2 chars per
#     renamed word + 1 per 26 replicas. A post-build check
#     measures the hashed vocabulary against the base and asserts
#     ~linear growth in REPLICAS (the advice's invariant, checked
#     rather than claimed).
HEAPS_TEXT_SUFFIX = (
    "CASE WHEN r.r = 0 THEN text ELSE array_to_string("
    "list_transform(string_split(text, ' '), "
    "t -> CASE WHEN hash(t) % 5 = 0 THEN t "
    "ELSE t || repeat('z', r.r) END), ' ') END AS text")
# --embhonest: deterministic per-(replica, dim) sign flips — an exact
# per-replica isometry (see the flag docstring). The flip bit MUST come
# from a family UNRELATED to the engine's hyperplane LCG: a first draft
# reused the srpSignatures formula, making the flip pattern s_r IDENTICAL
# to hyperplane pattern h_r, and bit20 of two affine sequences differing
# by a constant offset mostly agree — effective hyperplanes h∘s_r then
# correlate ~0.6 per plane ACROSS replicas and cross-replica bucket
# collisions ran 4.4x uniform (measured; BENCH_NOTES round 12). DuckDB's
# hash() has no such affine structure.
EMB_SIGNFLIP = (
    "CASE WHEN r.r = 0 THEN embedding ELSE "
    "list_transform(list_zip(embedding, range(0, 64)), "
    "z -> CASE WHEN hash(r.r * 64 + z[2]) % 2 = 0 "
    "THEN z[1] ELSE -z[1] END)::FLOAT[] END AS embedding")

HEAPS_TEXT_INFIX = (
    "CASE WHEN r.r = 0 THEN text ELSE array_to_string("
    "list_transform(string_split(text, ' '), "
    "t -> CASE WHEN hash(t) % 5 = 0 OR len(t) = 0 THEN t "
    "ELSE t[1:2] || chr(CAST(97 + r.r % 26 AS INTEGER)) || '~' "
    "|| t[3:] || repeat('~', r.r // 26) END), ' ') "
    "END AS text")


def main():
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    for t, shifts in SHIFTS.items():
        if ONLY is not None and t not in ONLY:
            continue
        src = f"{SRC}/{t}.parquet"
        dst = f"{OUT}/{t}.parquet"
        cols = [r[0] for r in
                con.execute(f"DESCRIBE SELECT * FROM '{src}'").fetchall()]
        if not shifts:
            con.execute(
                f"COPY (SELECT * FROM '{src}') TO '{dst}' (FORMAT PARQUET)")
        else:
            smap = dict(shifts)
            pmap = dict(PERTURB.get(t, {}))
            if HEAPS and t == "documents":
                # each scheme's disjointness proof rests on ITS rename
                # marker being absent from the base corpus — assert per
                # scheme rather than blanket (ADVICE r13: the old
                # any-'z' check rejected legitimate corpora containing
                # e.g. 'size'; the suffix scheme only needs that no
                # kept word ENDS with 'z', the infix scheme only that
                # '~' is absent)
                if REPLICAS <= 10:
                    cond = "regexp_matches(text, 'z( |$)')"
                    what = "a word ending in 'z'"
                else:
                    cond = "text LIKE '%~%'"
                    what = "a '~'"
                bad = con.execute(
                    f"SELECT count(*) FROM '{src}' WHERE {cond}"
                ).fetchone()[0]
                assert bad == 0, (
                    f"{bad} base documents contain {what} — heaps "
                    "vocabulary disjointness broken for this scheme")
                pmap["text"] = (HEAPS_TEXT_SUFFIX if REPLICAS <= 10
                                else HEAPS_TEXT_INFIX)
            if EMBHONEST and t == "embeddings":
                pmap["embedding"] = EMB_SIGNFLIP
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
        if HEAPS and t == "documents":
            # the invariant the fixture exists for, CHECKED in the
            # universe the engine counts (ADVICE r13): distinct
            # first-3-chars+length wordHash values must grow ~linearly
            # with replicas (renamed ~80% of the vocabulary x N
            # replicas, hash-disjoint by construction). The r13 prefix
            # scheme failed exactly this (built/base ratio ~flat).
            wh = ("ascii(substr(t || '___', 1, 1)) * 65536"
                  " + ascii(substr(t || '___', 2, 1)) * 256"
                  " + ascii(substr(t || '___', 3, 1))"
                  " + len(t) * 16777216")
            def hvocab(path):
                return con.execute(
                    "WITH w AS (SELECT DISTINCT unnest("
                    f"string_split(text, ' ')) AS t FROM '{path}') "
                    f"SELECT count(DISTINCT {wh}) FROM w "
                    "WHERE len(t) > 0").fetchone()[0]
            h0, h1 = hvocab(src), hvocab(dst)
            ratio = h1 / max(h0, 1)
            print(f"  heaps_hash_vocab: base={h0} built={h1} "
                  f"ratio={ratio:.2f} (replicas={REPLICAS})")
            assert ratio >= 0.5 * REPLICAS, (
                f"hashed vocabulary grew only x{ratio:.2f} over "
                f"{REPLICAS} replicas — renaming collapsed in the "
                "wordHash universe (expected ~0.8 x replicas)")


if __name__ == "__main__":
    main()
