"""Similarity / hashing column expressions: portable string->int hashing,
MinHash signatures, SimHash fingerprints, vector cosine.

Hashing is md5-based (not xxhash/murmur) so every value is reproducible in
any engine — the DuckDB oracles embed the exact same arithmetic. MinHash
permutation coefficients are generated deterministically in Python (seeded)
and baked as literals into BOTH the Spark plan and the oracle SQL.
"""

from __future__ import annotations

import hashlib
import random

from pyspark.sql import Column
from pyspark.sql import functions as F

MERSENNE_31 = 2_147_483_647  # minhash modulus (2^31-1, prime)


def md5_long(c: Column) -> Column:
    """First 15 hex digits of md5 as a non-negative bigint (< 2^60).

    Engine-portable: DuckDB equivalent is ``('0x' || substr(md5(x),1,15))::bigint``.
    """
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def md5_mod31(c: Column) -> Column:
    """md5_long folded into [0, 2^31-1) — safe for a*h+b in int64."""
    return F.pmod(md5_long(c), F.lit(MERSENNE_31))


def minhash_coefficients(n_perm: int, seed: int = 42) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for the universal-hash family
    h_i(x) = (a_i * x + b_i) mod (2^31-1); a < 2^20 keeps products in int64."""
    rng = random.Random(seed)
    return [(rng.randrange(1, 1 << 20), rng.randrange(0, MERSENNE_31)) for _ in range(n_perm)]


def minhash_signature(shingles: Column, coeffs: list[tuple[int, int]]) -> Column:
    """array<long> MinHash signature over an array<string> of shingles."""
    hashed = F.transform(shingles, lambda sh: md5_mod31(sh))
    sigs = [
        F.array_min(
            F.transform(
                hashed,
                lambda h: F.pmod(h * F.lit(a) + F.lit(b), F.lit(MERSENNE_31)),
            )
        )
        for a, b in coeffs
    ]
    return F.array(*sigs)


def simhash16(tokens: Column) -> Column:
    """16-bit SimHash over an array<string>: bit j set iff
    sum over distinct tokens of (+1 if bit j of md5_mod31(token) else -1) > 0."""
    hashed = F.transform(F.array_distinct(tokens), lambda t: md5_mod31(t))

    def _voter(mask: int):
        # arity must be exactly 2 — pyspark binds lambda params positionally
        return lambda acc, h: acc + F.when(
            h.bitwiseAND(F.lit(mask)) != 0, F.lit(1)
        ).otherwise(F.lit(-1))

    bits = []
    for j in range(16):
        vote = F.aggregate(hashed, F.lit(0).cast("long"), _voter(1 << j))
        bits.append(F.when(vote > 0, F.lit(1 << j)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("int")


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine of two array<float|double> columns in double precision.

    Sequential left-fold in array order — IEEE-deterministic, so the DuckDB
    oracle (list_dot_product over DOUBLE[]) reproduces it bit-for-bit.
    """
    ad = F.transform(a, lambda x: x.cast("double"))
    bd = F.transform(b, lambda x: x.cast("double"))
    dot = F.aggregate(
        F.zip_with(ad, bd, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    na = F.sqrt(
        F.aggregate(F.transform(ad, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)
    )
    nb = F.sqrt(
        F.aggregate(F.transform(bd, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)
    )
    return dot / (na * nb)


def hyperplane_sign_bits(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-LSH bucket id: bit p set iff dot(vec, plane_p) >= 0.

    ``planes`` are deterministic Python-side constants (see
    ``random_hyperplanes``) baked as literals.

    Dimension-checked: a vector whose length differs from the planes'
    raises at runtime. Without the check, ``zip_with`` null-pads the
    shorter side, every dot product goes NULL, every vector lands in
    bucket 0, and the bucketed composition silently degrades to the
    O(n^2) all-pairs path it exists to avoid.
    """
    dim = len(planes[0])
    vd = F.transform(vec, lambda x: x.cast("double"))
    acc = F.lit(0)
    for p, plane in enumerate(planes):
        arr = F.array(*[F.lit(v) for v in plane])
        dot = F.aggregate(
            F.zip_with(vd, arr, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
        )
        acc = acc + F.when(dot >= 0, F.lit(1 << p)).otherwise(F.lit(0))
    chk = F.assert_true(
        vec.isNotNull() & (F.size(vec) == dim),
        F.lit(f"hyperplane_sign_bits: embedding missing or dim != {dim}"),
    )
    # assert_true returns NULL when the predicate holds (throws otherwise),
    # so the when() passes the bits through unchanged on valid input
    return F.when(chk.isNull(), acc.cast("int"))


def random_hyperplanes(n_planes: int, dim: int, seed: int = 42) -> list[list[float]]:
    """Deterministic +-1 hyperplanes from md5 — reproducible anywhere."""
    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            h = hashlib.md5(f"plane{seed}.{p}.{d}".encode()).hexdigest()
            row.append(1.0 if int(h[:8], 16) % 2 == 0 else -1.0)
        planes.append(row)
    return planes
