#!/usr/bin/env python3
"""Dev-only scale-up generator: synthesize an sf-N corpus from an
existing testdata directory by disjoint-shard replication.

NOT part of the Scala library — uses the driver-side python stack
(pyarrow) purely to manufacture larger inputs for local scaling
measurements (SCALE.md). The driver's own testdata stays untouched.

Usage:
  python3 tools/gen_scale.py /root/testdata/sf0.1 /tmp/graft_sf1 10

Design: the output is `mult` disjoint "shards", each a key-remapped
copy of the source corpus, so every within-shard relationship
(referential integrity, dup structure, per-user event density,
within-shard near-dup pairs) is EXACTLY the source's, and cross-shard
relationships are engineered to (near-)zero:

  - star keys are offset per shard with a fixed stride (the source's
    key-domain size), preserving customer->orders->lineitem and
    part/supplier joins shard-locally;
  - events keep their timestamps (same windows, 10x the users) and
    user_id moves with the CUSTOMER stride — events.user_id joins
    o_custkey in the as-of query;
  - documents keep doc_id structure per shard and get a per-shard
    Caesar rotation over [a-z0-9A-Z]: length-preserving (n_chars stays
    valid), so shard vocabularies are disjoint and near-dup pair
    counts scale linearly instead of quadratically;
  - embeddings get a per-shard deterministic sign-flip pattern:
    norm-preserving, and cross-shard dot products of otherwise-equal
    vectors become +/-cancelling sums, so ANN/near-dup structure is
    shard-local too;
  - region/nation are fixed dimensions and are copied once, unchanged.

Schema (including events' TIMESTAMP(NANOS) ts, which Spark must read
via the nanosAsLong path) is preserved bit-for-bit by casting every
output table back to the source schema. Everything is deterministic —
no RNG anywhere.

Queries with literal key predicates (o_custkey <= 200,
l_partkey <= 50) keep constant output size by construction (only
shard 0 passes); their scan-side cost still scales, which is the
honest shape of a selective filter at 100 TB.
"""
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

LOWER = "abcdefghijklmnopqrstuvwxyz"
UPPER = LOWER.upper()
DIGIT = "0123456789"


def _md5_perm(alphabet, seed):
    """Deterministic Fisher–Yates permutation of `alphabet`, driven by
    an md5 byte stream keyed on `seed` — no RNG module, stable across
    runs and platforms."""
    import hashlib
    chars = list(alphabet)
    stream = b""
    counter = 0
    need = 2 * len(chars)
    while len(stream) < need:
        stream += hashlib.md5(f"perm{seed}_{counter}".encode()).digest()
        counter += 1
    k = 0
    for i in range(len(chars) - 1, 0, -1):
        j = (stream[2 * k] * 256 + stream[2 * k + 1]) % (i + 1)
        chars[i], chars[j] = chars[j], chars[i]
        k += 1
    return "".join(chars)


def caesar_table(shard):
    if shard == 0:
        return None
    if shard >= 26:
        # A 26-letter alphabet has only 25 non-identity rotations, so
        # rotation amounts MUST collide past 26 shards no matter how
        # they cycle: the source vocabulary is letter-only, and the r9
        # sf6/sf10 probes measured the consequence — shard k ≥ 26
        # reproduced shard 1+(k-1)%25's documents byte-for-byte
        # (distinct-text count saturated at 26 shard classes; sf10 was
        # a genuine ~4×-duplicated corpus and the dedup family's
        # ground-truth pair volume grew quadratically with the copy
        # count, exactly as dedup semantics demand on duplicated
        # input). Past the rotation budget, each shard gets a FULL
        # md5-seeded alphabet permutation instead: 26!/25! ≫ any shard
        # count, so shard vocabularies stay pairwise distinct at any
        # multiplier, and three-token shingle collisions across
        # differently-permuted shards are astronomically unlikely.
        # Shards 1..25 keep the historical rotation so every corpus up
        # to 26 shards (sf1, sf1.5, and the driver's own testdata) is
        # byte-identical to what earlier rounds measured.
        perm = (_md5_perm(LOWER, shard) + _md5_perm(UPPER, shard)
                + _md5_perm(DIGIT, shard))
        return str.maketrans(LOWER + UPPER + DIGIT, perm)
    # Rotation amounts cycle over 1..25 / 1..9 (never 0): a plain
    # `shard % 26` degenerates to the identity at shard 26 (and
    # `shard % 10` at shard 10), which would make those shards
    # near-duplicates of shard 0.
    rl = 1 + (shard - 1) % 25
    rd = 1 + (shard - 1) % 9
    rot = (
        LOWER[rl:] + LOWER[:rl]
        + UPPER[rl:] + UPPER[:rl]
        + DIGIT[rd:] + DIGIT[:rd])
    return str.maketrans(LOWER + UPPER + DIGIT, rot)


def sign_pattern(shard, dim):
    """Deterministic +/-1 pattern per (shard, dim index); identity for
    shard 0. Knuth multiplicative hash parity — no RNG, stable across
    runs."""
    if shard == 0:
        return [1.0] * dim
    return [1.0 if bin((i * 2654435761 + shard * 40503) & 0xFFFFFFFF)
            .count("1") % 2 == 0 else -1.0 for i in range(dim)]


def offset(table, col, stride, shard):
    if shard == 0 or col not in table.column_names:
        return table
    idx = table.schema.get_field_index(col)
    typ = table.schema.field(idx).type
    shifted = pc.add(table.column(col), pa.scalar(stride * shard, type=typ))
    return table.set_column(idx, table.schema.field(idx), shifted)


def main():
    src, dst, mult = sys.argv[1], sys.argv[2], int(sys.argv[3])
    import os
    os.makedirs(dst, exist_ok=True)

    def load(name):
        return pq.read_table(f"{src}/{name}.parquet")

    def emit(name, table, schema):
        out = table.cast(schema)
        pq.write_table(out, f"{dst}/{name}.parquet", compression="snappy")
        print(f"{name}: {out.num_rows} rows")

    # Fixed dimensions: copy once.
    for name in ("region", "nation"):
        t = load(name)
        emit(name, t, t.schema)

    # Star tables: per-shard key offsets with the source key-domain
    # stride (max key + 1, padded to a round stride for readability).
    K_CUST, K_SUPP, K_PART, K_ORD = 15000, 1000, 20000, 150000
    K_EVT, K_DOC = 100000, 5000
    plans = {
        "customer": [("c_custkey", K_CUST)],
        "supplier": [("s_suppkey", K_SUPP)],
        "part": [("p_partkey", K_PART)],
        "orders": [("o_orderkey", K_ORD), ("o_custkey", K_CUST)],
        "lineitem": [("l_orderkey", K_ORD), ("l_partkey", K_PART),
                     ("l_suppkey", K_SUPP)],
        # user_id lives in the customer key domain (as-of join).
        "events": [("event_id", K_EVT), ("user_id", K_CUST)],
    }
    for name, cols in plans.items():
        t = load(name)
        shards = []
        for s in range(mult):
            ts = t
            for col, stride in cols:
                ts = offset(ts, col, stride, s)
            shards.append(ts)
        emit(name, pa.concat_tables(shards), t.schema)

    # documents: doc_id offset + length-preserving per-shard Caesar.
    t = load("documents")
    texts = t.column("text").to_pylist()
    shards = []
    for s in range(mult):
        ts = offset(t, "doc_id", K_DOC, s)
        tr = caesar_table(s)
        if tr is not None:
            rotated = pa.array([x.translate(tr) for x in texts],
                               type=t.schema.field("text").type)
            ts = ts.set_column(t.schema.get_field_index("text"),
                               t.schema.field("text"), rotated)
        shards.append(ts)
    emit("documents", pa.concat_tables(shards), t.schema)

    # embeddings: vec_id offset (same domain as doc_id) + sign flips.
    t = load("embeddings")
    vecs = t.column("embedding").to_pylist()
    dim = len(vecs[0])
    shards = []
    for s in range(mult):
        ts = offset(t, "vec_id", K_DOC, s)
        pat = sign_pattern(s, dim)
        if s != 0:
            flipped = pa.array(
                [[v * p for v, p in zip(vec, pat)] for vec in vecs],
                type=t.schema.field("embedding").type)
            ts = ts.set_column(t.schema.get_field_index("embedding"),
                               t.schema.field("embedding"), flipped)
        shards.append(ts)
    emit("embeddings", pa.concat_tables(shards), t.schema)


if __name__ == "__main__":
    main()
