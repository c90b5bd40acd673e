"""Shared distributed-k-means core for the embedding operators.

One implementation of Lloyd's iteration serves both consumers — SemDeDup's
corpus-proportional clustering (operators/selection.py) and the IVF coarse
quantizer behind the materialized ANN index (operators/similarity.py):

- **assign** — Arrow-batched argmax-cosine against the centroid matrix as
  one (n x dim) @ (dim x k) numpy matmul per batch. Scales in k where a
  k-branch JVM expression tree cannot (Catalyst ANALYSIS cost is linear in
  the branch count — the _adc_udf finding); centroids are KBs of closure
  state, ties break to the lowest cell id (np.argmax first-max).
- **update** — per-partition EXACT integer partial sums (mapInPandas):
  each input partition emits one (cell, cnt, sums) row per occupied cell,
  with embeddings quantized to _CENT_SCALE units. Integer addition is
  order-free, so the reduced totals — and therefore the centroids — are
  bit-identical at any partitioning (pinned by test). The shuffle carries
  only partitions x occupied-cells rows instead of the posexplode plan's
  n·dim rows per round.
- **means** — driver-side float(Fraction(total, SCALE·count)): one
  correctly-rounded division per (cell, dim); only k·dim doubles ever
  reach the driver.

No query registrations here — this module is import-order-neutral
(registry build invariant).
"""

from __future__ import annotations

from fractions import Fraction

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

_CENT_SCALE = 10**12  # update quantization: exact integer picodims

_PARTIALS_SCHEMA = "cell long, cnt long, sums array<decimal(38,0)>"


def assign_udf(cents):
    """Arrow-batched cluster assignment: argmax cosine against the centroid
    matrix as one numpy matmul per batch; returns the 1-based cell id
    (matching the historical array_position convention)."""
    C = np.asarray(cents, dtype=np.float64)
    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)

    @F.pandas_udf(LongType())
    def assign(embs: pd.Series) -> pd.Series:
        if len(embs) == 0:  # np.vstack raises on an empty Arrow batch
            return pd.Series([], dtype="int64")
        X = np.vstack(embs.to_numpy())
        Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
        return pd.Series(np.argmax(Xn @ Cn.T, axis=1) + 1)

    return assign


def assign_with_centrality_udf(cents):
    """Like assign_udf but returns struct(cell, centrality): the winning
    1-based cell AND the winning cosine — for consumers that rank members
    by closeness to their centroid (cluster-balanced sampling)."""
    C = np.asarray(cents, dtype=np.float64)
    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)

    @F.pandas_udf("cell long, centrality double")
    def assign(embs: pd.Series) -> pd.DataFrame:
        if len(embs) == 0:  # np.vstack raises on an empty Arrow batch
            return pd.DataFrame({"cell": pd.Series([], dtype="int64"),
                                 "centrality": pd.Series([], dtype="float64")})
        X = np.vstack(embs.to_numpy())
        Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
        sims = Xn @ Cn.T
        best = np.argmax(sims, axis=1)
        return pd.DataFrame(
            {"cell": best + 1, "centrality": sims[np.arange(len(X)), best]}
        )

    return assign


def probe_udf(cents, nprobe: int):
    """Top-``nprobe`` cells per vector by descending cosine (1-based ids,
    stable lowest-id tie-break) as array<long> — the IVF query-side probe
    selection, batch-vectorized the same way as assignment."""
    C = np.asarray(cents, dtype=np.float64)
    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
    n_take = min(int(nprobe), len(C))

    @F.pandas_udf("array<long>")
    def probes(embs: pd.Series) -> pd.Series:
        if len(embs) == 0:
            return pd.Series([], dtype="object")
        X = np.vstack(embs.to_numpy())
        Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
        sims = Xn @ Cn.T
        order = np.argsort(-sims, axis=1, kind="stable")[:, :n_take]
        return pd.Series(list((order + 1).astype(np.int64)))

    return probes


def centroid_partials(dim: int):
    """Per-partition k-means partial sums (the q_embedding_gram Arrow
    partial-reduction discipline applied to the update step); see module
    docstring. Expects (cell, embedding) rows; emits _PARTIALS_SCHEMA.

    Overflow discipline: per Arrow batch the accumulator is int64
    (|x|·SCALE <~ 1e13 over <=10k-row batches < 2^63); across batches it
    is promoted to Python ints (dtype=object — unbounded), and the emitted
    sums are decimal(38,0), exact through the final Spark SUM."""

    def gen(batches):
        acc: dict[int, object] = {}
        cnt: dict[int, int] = {}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
            q = np.rint(X * _CENT_SCALE).astype(np.int64)
            cells = pdf["cell"].to_numpy()
            uniq, inv = np.unique(cells, return_inverse=True)
            sums = np.zeros((len(uniq), q.shape[1]), dtype=np.int64)
            np.add.at(sums, inv, q)  # batch-exact int64 scatter-add
            counts = np.bincount(inv, minlength=len(uniq))
            for i, cell in enumerate(uniq):
                c = int(cell)
                if c in acc:
                    acc[c] = acc[c] + sums[i].astype(object)
                else:
                    acc[c] = sums[i].astype(object)
                cnt[c] = cnt.get(c, 0) + int(counts[i])
        from decimal import Decimal

        if acc:
            yield pd.DataFrame(
                {
                    "cell": list(acc),
                    "cnt": [cnt[c] for c in acc],
                    "sums": [[Decimal(int(v)) for v in acc[c]] for c in acc],
                }
            )

    return gen


def lloyd_round(emb: DataFrame, cents: list[list[float]]) -> list[list[float]]:
    """One Lloyd's iteration over ``emb`` (must carry an ``embedding``
    column): Arrow assign -> integer partial sums -> exact driver means.
    Empty cells keep their previous centroid. Bit-identical at any input
    partitioning (order-free integer reduction; pinned by test)."""
    dim = len(cents[0])
    assigned = emb.select(
        "embedding", assign_udf(cents)(F.col("embedding")).alias("cell")
    )
    partials = assigned.mapInPandas(centroid_partials(dim), _PARTIALS_SCHEMA)
    # one pass: exploding the k·P partial rows is cheap (k·dim·P values);
    # every (cell, dim) group's SUM(cnt) equals the cell's total count,
    # so the count rides along — no second consumer of the lineage.
    new = (
        partials.select("cell", "cnt", F.posexplode("sums").alias("dim", "s"))
        .groupBy("cell", "dim")
        .agg(F.sum("s").alias("total"), F.sum("cnt").alias("n"))
        .collect()
    )
    by_cell: dict[int, list[float]] = {}
    for r in new:
        by_cell.setdefault(r.cell, [0.0] * dim)[r.dim] = float(
            Fraction(int(r.total), _CENT_SCALE * int(r.n))
        )
    return [by_cell.get(i + 1, cents[i]) for i in range(len(cents))]


def distinct_init(emb: DataFrame, k: int) -> list[list[float]]:
    """Deterministic k-means init: the first ``k`` DISTINCT embedding
    vectors in ``vec_id`` order. Exact-duplicate init vectors would
    tie-break every assignment to the lower cell id, leaving the twin cell
    permanently empty (empty cells keep their init centroid) — so we
    over-fetch a bounded window (4k rows, KBs-to-MBs on the driver even at
    the 65536-cell clamp) and de-duplicate preserving vec_id order. If the
    window holds fewer than k distinct vectors the tail is padded with the
    remaining rows in order (duplicates and all) so the fitted cell count
    stays exactly k — footer-scaled consumers pin len(centroids) ==
    ivf_cells(n)."""
    rows = [
        list(map(float, r.embedding))
        for r in emb.select("embedding").orderBy("vec_id").limit(4 * k).collect()
    ]
    seen: set[tuple] = set()
    out: list[list[float]] = []
    dupes: list[list[float]] = []
    for v in rows:
        key = tuple(v)
        if key in seen:
            dupes.append(v)
        else:
            seen.add(key)
            out.append(v)
        if len(out) == k:
            break
    while len(out) < k and dupes:
        out.append(dupes.pop(0))
    return out


def spread_init(emb: DataFrame, k: int, candidates_per_cell: int = 4) -> list[list[float]]:
    """Deterministic farthest-point (greedy k-center) init over a
    hash-sampled candidate pool — the ADAPTIVE init for retrains over a
    drifted corpus. A lowest-vec_id init can sit entirely inside the
    original distribution's region; Lloyd's iterations then capture a far
    drifted cluster with ONE centroid and can never split it (every
    drifted point stays nearest that same centroid), so the refit learns
    no resolution where the drift happened. Farthest-point guarantees the
    init covers every occupied region of the CURRENT data.

    Deterministic at any partitioning: the pool is an xxhash 1-in-step
    sample collected in vec_id order; selection starts from the lowest
    vec_id and breaks ties to the first (lowest-index) candidate. Driver
    cost is O(pool x k) numpy — pool ~ 4k vectors, fine at the test and
    sweep scales; at the 65536-cell clamp this is a heavy driver job,
    which is acceptable for an explicit offline REBUILD (the per-corpus
    trainers keep the O(k)-collect lowest-id init)."""
    n = emb.count()
    pool_target = max(k * candidates_per_cell, 64)
    step = max(1, n // pool_target)
    pool = (
        emb.filter(
            F.pmod(F.xxhash64(F.col("vec_id").cast("string")), F.lit(int(step))) == 0
        )
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .collect()
    )
    if not pool:
        return []
    X = np.asarray([list(map(float, r.embedding)) for r in pool], dtype=np.float64)
    nrm = np.linalg.norm(X, axis=1, keepdims=True)
    Xn = X / np.where(nrm == 0.0, 1.0, nrm)
    chosen = [0]
    minsim = Xn @ Xn[0]  # per-candidate max cosine to any chosen centroid
    while len(chosen) < min(k, len(X)):
        nxt = int(np.argmin(minsim))  # farthest (least similar); first-min tie-break
        chosen.append(nxt)
        minsim = np.maximum(minsim, Xn @ Xn[nxt])
    out = [list(map(float, X[i])) for i in chosen]
    rest = [i for i in range(len(X)) if i not in set(chosen)]
    while len(out) < k and rest:  # pool smaller than k: pad in id order
        out.append(list(map(float, X[rest.pop(0)])))
    while len(out) < k and len(out) > 0:  # corpus smaller than k: keep k stable
        out.append(list(out[len(out) % max(1, len(chosen))]))
    return out


def farthest_point_l2(X: "np.ndarray", k: int) -> list[int]:
    """Greedy k-center indices over rows of X in l2 — the subvector-space
    flavor of spread_init (PQ codebooks assign by l2, not cosine). Starts
    at row 0, ties break to the first index: deterministic."""
    chosen = [0]
    d = ((X - X[0]) ** 2).sum(axis=1)
    while len(chosen) < min(k, len(X)):
        nxt = int(np.argmax(d))
        chosen.append(nxt)
        d = np.minimum(d, ((X - X[nxt]) ** 2).sum(axis=1))
    return chosen


def fit_kmeans(emb: DataFrame, init: list[list[float]], iters: int) -> list[list[float]]:
    """Fixed-iteration Lloyd's from a deterministic init. Only the
    centroids (k·dim doubles) ever reach the driver; every pass over the
    data is one map-only assign + one partials reduction."""
    cents = [list(map(float, c)) for c in init]
    for _ in range(iters):
        cents = lloyd_round(emb, cents)
    return cents
