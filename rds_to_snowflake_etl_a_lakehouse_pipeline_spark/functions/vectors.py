"""Vector math over ``array<float>`` embedding columns.

Built on ``F.zip_with`` / ``F.aggregate`` higher-order functions: the
fold runs JVM-side per row (no Python), sequentially left-to-right, so
results are deterministic and reproducible against a SQL oracle that
folds the same way. Elements are cast to double before multiply/add so
a float32-stored embedding accumulates at double precision.

At 100 TB these are the per-row kernels; the scale story (block-wise
top-k, LSH bucketing) lives in ``operators/similarity.py``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def dot_product(a: Column | str, b: Column | str) -> Column:
    """Σ aᵢ·bᵢ at double precision (sequential fold)."""
    x, y = _col(a), _col(b)
    prods = F.zip_with(x, y, lambda u, v: u.cast("double") * v.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, p: acc + p)


def l2_norm(a: Column | str) -> Column:
    """‖a‖₂ at double precision."""
    x = _col(a)
    sq = F.transform(x, lambda u: u.cast("double") * u.cast("double"))
    return F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, p: acc + p))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """dot(a,b) / (‖a‖·‖b‖); NULL when either norm is 0.

    Inside a pair/candidate JOIN prefer :func:`cosine_from_norms` with
    norms projected per side BEFORE the join: this form re-derives both
    norms per PAIR (3× the interpreted work of the dot product alone),
    which is O(pairs·dim) wasted at any scale.
    """
    x, y = _col(a), _col(b)
    denom = l2_norm(x) * l2_norm(y)
    return F.when(denom != 0, dot_product(x, y) / denom)


def cosine_from_norms(
    a: Column | str, b: Column | str, na: Column | str, nb: Column | str
) -> Column:
    """cos(a,b) given precomputed ‖a‖, ‖b‖ — the join-friendly form:
    norms are O(dim) per ROW projected once on each join side; the
    per-pair cost is only the dot product. Same expression tree as
    :func:`cosine_similarity` (dot / (na·nb), NULL when either norm is
    0), so results are bit-identical."""
    x, y, n1, n2 = _col(a), _col(b), _col(na), _col(nb)
    return F.when((n1 != 0) & (n2 != 0), dot_product(x, y) / (n1 * n2))


def int8_quantize(a: Column | str) -> Column:
    """Symmetric int8 quantization of an embedding: struct of
    ``scale = max|aᵢ| / 127`` (double) and ``q = round(aᵢ / scale)``
    (array<int> in [−127, 127]) — the 4× storage/bandwidth compression
    tier below PQ (which compresses further but needs a trained
    codebook; int8 is codebook-free and per-vector). All-zero / empty
    vectors quantize to scale 0 with zero codes (guarded division).
    Pure higher-order functions — JVM-side, oracle-replayable."""
    x = _col(a)
    amax = F.aggregate(
        F.transform(x, lambda u: F.abs(u.cast("double"))),
        F.lit(0.0),
        lambda acc, u: F.greatest(acc, u),
    )
    scale = amax / F.lit(127.0)
    q = F.when(scale == 0, F.transform(x, lambda u: F.lit(0))).otherwise(
        F.transform(x, lambda u: F.round(u.cast("double") / scale).cast("int"))
    )
    return F.struct(scale.alias("scale"), q.alias("q"))


def int8_dequantize(qstruct: Column | str) -> Column:
    """Inverse of :func:`int8_quantize`: ``qᵢ · scale`` as
    array<double> (lossy — error ≤ scale/2 per component)."""
    s = _col(qstruct)
    return F.transform(
        s["q"], lambda u: u.cast("double") * s["scale"]
    )


def sign_matrix(in_dim: int, out_dim: int, seed: int = 42) -> list[list[float]]:
    """±1 projection matrix derived from md5 parity — deterministic,
    engine-neutral (any SQL engine with md5 regenerates it exactly:
    sign[k][j] = +1 iff the first hex digit of md5("seed:k:j") is
    0-7). Driver-side, out_dim × in_dim entries, built once and
    embedded as literals."""
    import hashlib

    return [
        [
            1.0
            if int(hashlib.md5(f"{seed}:{k}:{j}".encode()).hexdigest()[0], 16) < 8
            else -1.0
            for j in range(in_dim)
        ]
        for k in range(out_dim)
    ]


def sign_project(
    a: Column | str, in_dim: int, out_dim: int, seed: int = 42
) -> Column:
    """Signed random projection (Achlioptas-style Johnson-Lindenstrauss):
    ``y_k = (Σ_j sign[k][j] · a_j) / √out_dim`` with the ±1 matrix from
    :func:`sign_matrix` — dimensionality reduction that preserves
    pairwise distances within the JL distortion (~1/√out_dim), as the
    cheap tier below PQ/int8 for ANN pre-filtering and sketching.

    Pure Catalyst: out_dim sequential folds of in_dim JVM-side
    multiply-adds per row, matrix embedded as literals — no Python, no
    shuffle, scan-fused; and because the matrix regenerates from md5 in
    ANY engine, the projection is oracle-replayable end-to-end (each
    component rounds to 6 dp). Rows shorter than ``in_dim`` fold over
    their actual length (zip_with pads with NULL → treated as 0)."""
    import math

    x = _col(a)
    comps = []
    for row in sign_matrix(in_dim, out_dim, seed):
        arr = F.array(*[F.lit(s) for s in row])
        prods = F.zip_with(
            x, arr, lambda u, v: F.coalesce(u.cast("double") * v, F.lit(0.0))
        )
        comps.append(
            F.round(
                F.aggregate(prods, F.lit(0.0), lambda acc, p: acc + p)
                / math.sqrt(out_dim),
                6,
            )
        )
    return F.array(*comps)
