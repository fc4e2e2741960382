"""Batch top-k similarity join — the engine's replacement for ScyllaDB's
``ORDER BY embedding ANN OF ? LIMIT k`` (HNSW/USearch, SURVEY §4.4).

Three strategies, one API:

1. ``topk_similarity_join`` (exact, expression-based): broadcast the
   query side, join against the corpus, cosine via native array exprs,
   rank per query.  O(Q·N·d) but fully JVM-side and embarrassingly
   parallel over corpus partitions; correct oracle for everything else.

2. ``topk_similarity_join_blocked`` (exact, vectorized): same result,
   but the corpus side is consumed per-partition by a ``mapInPandas``
   NumPy matmul with a per-partition top-k, then a cheap global re-rank
   of Q·k·P candidate rows.  This is the 100 TB path: float32 BLAS
   inside Arrow batches, shuffle only the per-partition winners
   (Q × k rows per partition), never the corpus.

3. ``lsh_topk_similarity_join`` (approximate): L2-normalize both sides
   (Euclidean on unit vectors is monotone in cosine) and bucket with
   random hyperplane projections; candidates = bucket collisions, then
   exact re-rank.  Trades recall for avoiding the Q×N product.

Unlike ScyllaDB's ANN (no WHERE allowed — the reference over-fetches
LIMIT 50-100 then client-filters, ``detect_anomalies_vector_search.py:
106-149``), filters here compose *before* ranking: pass a pre-filtered
corpus DataFrame and LIMIT semantics stay exact (SURVEY §4 last row).
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from vectorsearch_scylla_spark.functions.vector import cosine_similarity, l2_normalize


def topk_similarity_join(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    query_id: str = "query_id",
    corpus_id: str = "corpus_id",
    query_vec: str = "query_vec",
    corpus_vec: str = "corpus_vec",
    threshold: float | None = None,
    exclude_self: bool = False,
    join_keys: list[str] | None = None,
) -> DataFrame:
    """Exact brute-force top-k cosine join.

    Returns (query_id, corpus_id, [join_keys...], similarity, rank),
    rank 1..k per query ordered by similarity desc (ties broken by
    corpus_id so results are deterministic / oracle-stable).

    ``exclude_self`` drops corpus rows whose id equals the query id —
    the reference's anti-self join (SURVEY J6,
    ``pipeline/path3_vector_search.py:149-151``) — encoded in the join
    predicate, not post-hoc, so LIMIT semantics are preserved
    (SURVEY §7.5).

    ``join_keys``: columns present on BOTH sides that must match
    (e.g. same-device constraint, ``path3_vector_search.py:137-140``).
    Equi-keys turn the broadcast nested-loop into a broadcast HASH
    join — at scale this prunes the candidate space from Q×N to
    Q×N/keys before any cosine is computed.

    Scale: the query side is broadcast (Q small — detection works on
    one microbatch of new snapshots); the corpus side streams through
    executors partition-by-partition.  No shuffle of the corpus; the
    only shuffle is the final rank over Q·N' candidate rows, which the
    optional ``threshold`` prunes first.
    """
    join_keys = join_keys or []
    q = queries.select(
        F.col(query_id).alias("__qid"),
        F.col(query_vec).alias("__qvec"),
        *[F.col(kcol) for kcol in join_keys],
    )
    c = corpus.select(
        F.col(corpus_id).alias("__cid"),
        F.col(corpus_vec).alias("__cvec"),
        *[F.col(kcol).alias(f"__k_{kcol}") for kcol in join_keys],
    )
    cond = F.lit(True) if not exclude_self else (F.col("__qid") != F.col("__cid"))
    for kcol in join_keys:
        cond = cond & (F.col(kcol) == F.col(f"__k_{kcol}"))
    pairs = c.join(F.broadcast(q), on=cond, how="inner").withColumn(
        "similarity", cosine_similarity("__qvec", "__cvec")
    )
    if threshold is not None:
        pairs = pairs.filter(F.col("similarity") >= threshold)
    w = Window.partitionBy("__qid").orderBy(
        F.col("similarity").desc(), F.col("__cid").asc()
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("__qid").alias(query_id),
            F.col("__cid").alias(corpus_id),
            *join_keys,
            "similarity",
            "rank",
        )
    )


def topk_similarity_join_blocked(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    query_id: str = "query_id",
    corpus_id: str = "corpus_id",
    query_vec: str = "query_vec",
    corpus_vec: str = "corpus_vec",
    exclude_self: bool = False,
    dtype: str = "float32",
    join_keys: list[str] | None = None,
    max_query_rows: int = 4096,
    max_collect_rows: int = 1_048_576,
) -> DataFrame:
    """Exact top-k via per-partition NumPy matmul + global re-rank.

    Same result set as ``topk_similarity_join`` (with ``dtype=
    "float64"`` the dot products agree with the expression/SQL oracles
    to fp rounding; float32 is the cheaper 100 TB default).  The corpus
    never shuffles: each partition emits ~Q×k candidate rows, and the
    global re-rank runs over Q×k×num_partitions rows — negligible
    versus N.

    ``join_keys`` restricts each query's candidates to corpus rows with
    equal key values (IVF cluster probe / same-device constraint) —
    applied as a mask INSIDE the kernel so per-batch top-k stays exact.

    The query side is collected ONCE (a single evaluation of the query
    plan — safe for nondeterministic inputs like ``sample``/``limit``)
    then sliced into chunks of ``max_query_rows``: each chunk is a
    bounded broadcast whose kernel scans the corpus once, and all
    chunks' candidates union into one global re-rank (one job — chunk
    scans run concurrently).  Driver memory is O(Q × d) for the collect
    (the query side is assumed small relative to the corpus); chunking
    bounds each broadcast and each kernel's working set to
    O(max_query_rows × d).  The corpus still never shuffles; the trade
    is ceil(Q / max_query_rows) corpus scans, the classic blocked
    exact-kNN sweep.  Id columns keep whatever type the inputs carry
    (string snapshot ids, long vec ids, ...).

    This is strategy (1)+(2) of SURVEY §4.4: block matmul in
    ``mapInPandas``, top-k per block, re-rank global top-k.

    **Large-Q / no-driver-collect variant**: when Q is itself corpus-
    sized (a full self-join, 100 TB query stream), the driver collect
    here is the wrong shape.  The repo's distributed alternative is
    ``functions.hyperplane.hyperplane_topk_join``: both sides are
    signed against the same fixed-seed hyperplane matrix (a map-only
    matmul, no fit, no collect), candidates come from a (band_idx,
    band_val) equi-join — a plain shuffle join Spark scales
    horizontally, AQE handling any skewed bucket — and an Arrow
    float64 kernel re-ranks exactly over candidates only.  Trade-off:
    it is approximate (recall is a function of n_bands × band_bits vs
    the similarity floor; 16×16 bands miss a 0.995-cosine neighbor
    with prob ~5e-7), so this blocked exact sweep remains the path for
    small-Q / exactness; the hyperplane join is the path when Q no
    longer fits a driver.  When EXACTNESS must also survive large Q,
    ``topk_similarity_join_cogrouped`` (below) is the two-sided block
    join: no collect on either side, same |Q|·|C| dot products (the
    cost exactness admits nothing less than), shuffle volume
    Q·CB + N·QB replica rows.  Banding remains the only way to beat
    that product, which is why the distributed default stays
    LSH-first.

    ``max_collect_rows`` enforces that bounded-Q contract (r9 VERDICT:
    a corpus-sized Q here was a silent driver OOM, not an actionable
    error): the collect is capped at ``max_collect_rows + 1`` rows —
    so the guard itself can never OOM the driver — and exceeding the
    cap raises, naming the two large-Q paths above.
    """
    import math

    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    np_dtype = np.dtype(dtype)
    join_keys = join_keys or []
    sc = queries.sparkSession
    # limit(cap+1) bounds the driver transfer BEFORE it happens; on an
    # in-contract query side (≤ cap rows) it is the identity and the
    # plan is still evaluated exactly once.
    qrows_all = (
        queries.select(query_id, query_vec, *join_keys)
        .limit(int(max_collect_rows) + 1)
        .collect()
    )
    if len(qrows_all) > max_collect_rows:
        raise ValueError(
            "topk_similarity_join_blocked: query side exceeds "
            f"max_collect_rows={max_collect_rows} — this exact sweep "
            "collects Q to the driver and is the SMALL-Q path.  For a "
            "corpus-sized Q use topk_similarity_join_cogrouped (exact, "
            "no collect on either side) or "
            "functions.hyperplane.hyperplane_topk_join (approximate, "
            "banded); or raise max_collect_rows if the driver can "
            "genuinely hold Q."
        )
    n_q = len(qrows_all)
    if not n_q:
        return topk_similarity_join(
            queries, corpus, k, query_id, corpus_id, query_vec, corpus_vec
        )
    nchunks = max(1, math.ceil(n_q / max_query_rows))

    out_fields = [
        T.StructField(corpus_id, corpus.schema[corpus_id].dataType, True),
        T.StructField("__qidx", T.IntegerType(), False),
        T.StructField("similarity", T.DoubleType(), False),
    ]
    out_schema = T.StructType(out_fields)
    qid_schema = T.StructType(
        [
            T.StructField("__qidx", T.IntegerType(), False),
            T.StructField(query_id, queries.schema[query_id].dataType, True),
        ]
    )
    # exclude_self drops ≤1 row per query AFTER the per-batch top-k, so
    # each batch must supply one spare candidate to keep global rank k
    # exact at the margin.
    kk_target = k + 1 if exclude_self else k

    def chunk_candidates(qrows: list) -> DataFrame:
        qids = [r[query_id] for r in qrows]
        qmat = np.asarray([r[query_vec] for r in qrows], dtype=np_dtype)
        qnorm = np.linalg.norm(qmat, axis=1, keepdims=True)
        qnorm[qnorm == 0.0] = 1.0
        qunit = qmat / qnorm
        if join_keys:
            # build a 1-D object array explicitly — np.asarray of
            # equal-length tuples would silently produce a 2-D array and
            # break broadcasting
            qkeys = np.empty(len(qrows), dtype=object)
            qkeys[:] = [tuple(r[kc] for kc in join_keys) for r in qrows]
        else:
            qkeys = None
        bq = sc.sparkContext.broadcast((qunit, qkeys))

        def block_topk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            qunit_b, qkeys_b = bq.value
            nq = qunit_b.shape[0]
            for pdf in batches:
                if pdf.empty:
                    continue
                cmat = np.asarray(list(pdf[corpus_vec]), dtype=np_dtype)
                cnorm = np.linalg.norm(cmat, axis=1, keepdims=True)
                cnorm[cnorm == 0.0] = 1.0
                sims = (cmat / cnorm) @ qunit_b.T  # (n_corpus, n_queries)
                if qkeys_b is not None:
                    btuples = [
                        tuple(t) for t in pdf[join_keys].itertuples(index=False)
                    ]
                    bkeys = np.empty(len(btuples), dtype=object)
                    bkeys[:] = btuples
                    match = bkeys[:, None] == qkeys_b[None, :]
                    sims = np.where(match, sims, -np.inf)
                cids = pdf[corpus_id].to_numpy()
                kk = min(kk_target, sims.shape[0])
                # per-query partial top-k within this Arrow batch
                idx = np.argpartition(-sims, kk - 1, axis=0)[:kk, :]
                rows = {corpus_id: [], "__qidx": [], "similarity": []}
                for qi in range(nq):
                    # argpartition breaks boundary ties arbitrarily, but
                    # the global re-rank breaks them by corpus_id ASC —
                    # emit ALL candidates tied with the kth value so the
                    # deterministic winner is never dropped batch-side.
                    kth = sims[idx[:, qi], qi].min()
                    if kth == -np.inf:
                        # fewer matching candidates than k in this batch
                        # — emit only the real (non-masked) ones
                        sel = np.nonzero(sims[:, qi] > -np.inf)[0]
                    else:
                        sel = np.nonzero(sims[:, qi] >= kth)[0]
                    if not len(sel):
                        continue
                    rows[corpus_id].extend(cids[sel])
                    rows["__qidx"].extend([qi] * len(sel))
                    rows["similarity"].extend(sims[sel, qi].astype(np.float64))
                yield pd.DataFrame(rows)

        cand = corpus.select(corpus_id, corpus_vec, *join_keys).mapInPandas(
            block_topk, schema=out_schema
        )
        qid_df = sc.createDataFrame(
            [(i, qid) for i, qid in enumerate(qids)], schema=qid_schema
        )
        return cand.join(F.broadcast(qid_df), "__qidx").drop("__qidx")

    if nchunks == 1:
        joined = chunk_candidates(qrows_all)
    else:
        parts = [
            chunk_candidates(qrows_all[ci * max_query_rows : (ci + 1) * max_query_rows])
            for ci in range(nchunks)
        ]
        joined = parts[0]
        for p in parts[1:]:
            joined = joined.unionByName(p)
    if exclude_self:
        joined = joined.filter(F.col(query_id) != F.col(corpus_id))
    w = Window.partitionBy(query_id).orderBy(
        F.col("similarity").desc(), F.col(corpus_id).asc()
    )
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, corpus_id, "similarity", "rank")
    )


def topk_similarity_join_cogrouped(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    query_id: str = "query_id",
    corpus_id: str = "corpus_id",
    query_vec: str = "query_vec",
    corpus_vec: str = "corpus_vec",
    exclude_self: bool = False,
    dtype: str = "float32",
    n_query_blocks: int = 8,
    n_corpus_blocks: int = 8,
) -> DataFrame:
    """Exact top-k cosine with NO driver collect on EITHER side — the
    large-Q shape ``topk_similarity_join_blocked``'s docstring reserves
    for when the query set no longer fits a driver.

    Two-sided block join: each query gets a deterministic block id
    ``pmod(xxhash64(id), QB)`` and is replicated once per corpus block
    (CB copies); each corpus row symmetrically gets ``pmod(xxhash64(id),
    CB)`` and QB copies.  A cogrouped ``applyInPandas`` then runs the
    same BLAS matmul + per-group top-k (boundary ties kept, one spare
    candidate under exclude_self) on every (qb, cb) cell, and the global
    re-rank merges Q·k·CB candidate rows.  Exactness argument is the
    per-batch one: every global top-k neighbor is inside its (qb, cb)
    cell's top-k because the cell's corpus is a subset of the corpus.

    Cost model vs the blocked sweep: total dot products are identical
    (|Q|·|C| — exactness admits nothing less); what changes is WHERE
    the query side lives.  Shuffle volume is Q·CB + N·QB rows instead
    of a driver collect + ceil(Q/4096) broadcast corpus scans, so both
    sides stream through executors and Q is unbounded.  Choose
    QB ≈ |Q|/4096, CB ≈ |C|/4096 so each cell's matmul fits an Arrow
    working set; at fixed cell size the cell count grows with Q·N — at
    which point the banded ``hyperplane_topk_join`` remains the
    recommended escape from exactness (see the blocked docstring).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    np_dtype = np.dtype(dtype)
    qb_n, cb_n = int(n_query_blocks), int(n_corpus_blocks)
    kk = k + 1 if exclude_self else k

    qrep = queries.select(
        F.col(query_id).alias("__qid"),
        F.col(query_vec).alias("__qvec"),
        F.pmod(F.xxhash64(F.col(query_id)), F.lit(qb_n)).cast("int").alias("__qb"),
    ).withColumn("__cb", F.explode(F.array(*[F.lit(i) for i in range(cb_n)])))
    crep = corpus.select(
        F.col(corpus_id).alias("__cid"),
        F.col(corpus_vec).alias("__cvec"),
        F.pmod(F.xxhash64(F.col(corpus_id)), F.lit(cb_n)).cast("int").alias("__cb"),
    ).withColumn("__qb", F.explode(F.array(*[F.lit(i) for i in range(qb_n)])))

    out_schema = T.StructType(
        [
            T.StructField(query_id, queries.schema[query_id].dataType, True),
            T.StructField(corpus_id, corpus.schema[corpus_id].dataType, True),
            T.StructField("similarity", T.DoubleType(), False),
        ]
    )

    def block_topk(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty or right.empty:
            return pd.DataFrame({query_id: [], corpus_id: [], "similarity": []})
        qmat = np.asarray(list(left["__qvec"]), dtype=np_dtype)
        qnorm = np.linalg.norm(qmat, axis=1, keepdims=True)
        qnorm[qnorm == 0.0] = 1.0
        qunit = qmat / qnorm
        cmat = np.asarray(list(right["__cvec"]), dtype=np_dtype)
        cnorm = np.linalg.norm(cmat, axis=1, keepdims=True)
        cnorm[cnorm == 0.0] = 1.0
        sims = (cmat / cnorm) @ qunit.T  # (n_corpus, n_queries)
        cids = right["__cid"].to_numpy()
        qids = left["__qid"].to_numpy()
        kk_eff = min(kk, sims.shape[0])
        idx = np.argpartition(-sims, kk_eff - 1, axis=0)[:kk_eff, :]
        out_q: list = []
        out_c: list = []
        out_s: list = []
        for qi in range(sims.shape[1]):
            # keep every candidate tied with the kth value — the global
            # re-rank breaks ties by corpus_id ASC, and argpartition's
            # arbitrary boundary choice must not drop the winner
            kth = sims[idx[:, qi], qi].min()
            sel = np.nonzero(sims[:, qi] >= kth)[0]
            out_q.extend([qids[qi]] * len(sel))
            out_c.extend(cids[sel])
            out_s.extend(sims[sel, qi].astype(np.float64))
        return pd.DataFrame({query_id: out_q, corpus_id: out_c, "similarity": out_s})

    cand = (
        qrep.groupby("__qb", "__cb")
        .cogroup(crep.groupby("__qb", "__cb"))
        .applyInPandas(block_topk, schema=out_schema)
    )
    if exclude_self:
        cand = cand.filter(F.col(query_id) != F.col(corpus_id))
    w = Window.partitionBy(query_id).orderBy(
        F.col("similarity").desc(), F.col(corpus_id).asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, corpus_id, "similarity", "rank")
    )


def cosine_pairs_blocked(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_collect_rows: int = 1_048_576,
) -> DataFrame:
    """All pairs (id_a < id_b) with cosine similarity > threshold, via
    per-partition NumPy float64 matmul against a broadcast of the full
    matrix.

    The N×N pair space never materializes as rows: each Arrow batch of
    B rows does one (B × N) BLAS multiply and emits only the pairs
    above threshold.  At demo scale this replaced an interpreted
    expression self-join that was ~100× slower.  BOUNDED INPUTS ONLY:
    this collects + broadcasts the full (id, vector) set, so it is the
    exact kernel you run per LSH/MinHash bucket or on one detection
    microbatch — the registry's corpus-scale near-dup query
    (``embedding_neardup_pairs``) instead uses
    ``functions.hyperplane.hyperplane_near_dup_pairs``: seeded
    random-hyperplane band candidates + an exact per-candidate cosine
    kernel, never this on a whole corpus.

    Ids keep the input column's type (orderable — pairs are deduped by
    ``id_a < id_b``).  float64 end-to-end so results hash-match a
    double-precision SQL oracle.

    ``max_collect_rows`` enforces the bounded-inputs contract the same
    way ``topk_similarity_join_blocked`` does (r10): the collect is
    capped at ``max_collect_rows + 1`` rows — the guard itself cannot
    OOM the driver — and exceeding the cap raises, naming the
    corpus-scale alternative.
    """
    import numpy as np
    import pandas as pd

    id_dt = df.schema[id_col].dataType.simpleString()
    rows = df.select(id_col, vec_col).limit(int(max_collect_rows) + 1).collect()
    if len(rows) > max_collect_rows:
        raise ValueError(
            "cosine_pairs_blocked: input exceeds max_collect_rows="
            f"{max_collect_rows} — this kernel broadcasts the full "
            "(id, vector) set and is the BOUNDED-INPUT path (per LSH/"
            "MinHash bucket, one detection microbatch).  For a whole "
            "corpus use functions.hyperplane.hyperplane_near_dup_pairs "
            "(banded candidates + exact per-candidate cosine); or raise "
            "max_collect_rows if the driver can genuinely hold the set."
        )
    ids = np.asarray([r[id_col] for r in rows])
    mat = np.asarray([r[vec_col] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    zero = norms == 0.0
    norms[zero] = 1.0
    unit = mat / norms
    spark = df.sparkSession
    b = spark.sparkContext.broadcast((ids, unit, zero.ravel()))

    def emit_pairs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        all_ids, all_unit, all_zero = b.value
        for pdf in batches:
            if pdf.empty:
                continue
            bids = pdf[id_col].to_numpy()
            bmat = np.asarray(list(pdf[vec_col]), dtype=np.float64)
            bnorms = np.linalg.norm(bmat, axis=1, keepdims=True)
            bzero = (bnorms == 0.0).ravel()
            bnorms[bnorms == 0.0] = 1.0
            sims = (bmat / bnorms) @ all_unit.T  # (B, N)
            sims[bzero, :] = 0.0  # zero-norm guard: cos := 0
            sims[:, all_zero] = 0.0
            ii, jj = np.nonzero((sims > threshold) & (bids[:, None] < all_ids[None, :]))
            yield pd.DataFrame(
                {
                    "id_a": bids[ii],
                    "id_b": all_ids[jj],
                    "similarity": sims[ii, jj],
                }
            )

    return df.select(id_col, vec_col).mapInPandas(
        emit_pairs, schema=f"id_a {id_dt}, id_b {id_dt}, similarity double"
    )


def lsh_topk_similarity_join(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    query_id: str = "query_id",
    corpus_id: str = "corpus_id",
    query_vec: str = "query_vec",
    corpus_vec: str = "corpus_vec",
    bucket_length: float = 2.0,
    num_hash_tables: int = 3,
    seed: int = 42,
    distance_threshold: float = 2.0,
    exclude_self: bool = False,
) -> DataFrame:
    """Approximate top-k: random-hyperplane LSH candidates + exact re-rank.

    Uses ``BucketedRandomProjectionLSH`` on L2-normalized vectors —
    Euclidean distance on unit vectors is monotone in cosine
    (dist² = 2 − 2·cos), so Euclidean buckets preserve cosine
    neighborhoods (SURVEY §4.4 option 2).  Recall is tunable via
    ``num_hash_tables`` (more tables → more candidates → higher
    recall); tests check recall ≥ 0.9 against the exact join.

    ``distance_threshold`` bounds the L2 distance of emitted candidate
    pairs (2.0 = no bound on unit vectors).  For near-duplicate /
    similar-state retrieval pass the cosine floor's distance image,
    ``sqrt(2 − 2·min_cos)`` — the join then prunes unrelated pairs
    instead of carrying them to the re-rank, which is what makes the
    approximate join sub-quadratic in practice.  ``exclude_self`` drops
    query==corpus id matches before ranking (for self-join retrieval
    where the query set is a subset of the corpus).
    """
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector
    from pyspark.ml.linalg import VectorUDT  # noqa: F401  (ensures ml is loadable)

    qn = queries.select(
        F.col(query_id).alias("__qid"),
        F.col(query_vec).alias("__qvec"),
        array_to_vector(l2_normalize(query_vec)).alias("features"),
    )
    cn = corpus.select(
        F.col(corpus_id).alias("__cid"),
        F.col(corpus_vec).alias("__cvec"),
        array_to_vector(l2_normalize(corpus_vec)).alias("features"),
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="features",
        outputCol="__hashes",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=seed,
    )
    model = lsh.fit(cn)
    # unit vectors: max L2 distance is 2.0 → threshold 2.0 keeps all
    # colliding candidates; ranking below is exact cosine.
    cand = model.approxSimilarityJoin(
        model.transform(qn), model.transform(cn), distance_threshold, distCol="__dist"
    ).select(
        F.col("datasetA.__qid").alias("__qid"),
        F.col("datasetB.__cid").alias("__cid"),
        cosine_similarity(F.col("datasetA.__qvec"), F.col("datasetB.__cvec")).alias(
            "similarity"
        ),
    )
    if exclude_self:
        cand = cand.filter(F.col("__qid") != F.col("__cid"))
    w = Window.partitionBy("__qid").orderBy(
        F.col("similarity").desc(), F.col("__cid").asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("__qid").alias(query_id),
            F.col("__cid").alias(corpus_id),
            "similarity",
            "rank",
        )
    )
