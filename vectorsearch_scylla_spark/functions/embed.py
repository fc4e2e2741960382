"""Inference-shaped embedding generation over ``mapInPandas`` — the
pluggable-vectorizer surface of the reference (V2: ``--embedding-method
{ollama_text, tabtransformer}``, ``pipeline/kafka_consumer.py:649-654``;
SURVEY §2.9).

The reference calls a served model per snapshot; the Spark-first shape
is an Arrow-batched ``mapInPandas`` stage whose per-executor "model" is
initialized LAZILY ONCE per python worker (the standard pattern for an
ONNX session / HTTP client / tokenizer: closure state survives across
batches within a worker, so model load cost amortizes over the whole
partition, not per batch).  No model weights ship with this repo and no
external service exists in this environment, so the bundled model is a
DETERMINISTIC stand-in — a seeded random projection over hashed
bag-of-tokens — but every piece of Spark plumbing is production-real:
the Arrow batch path, the lazy init, the ``array<float>`` output
schema, batch-size independence, and the partition-count invariance the
tests pin down.  Swapping in a real model is replacing ``_Model.encode``
only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


class _Model:
    """Deterministic stand-in for a served/loaded embedding model.

    ``encode`` maps a list of texts to (n, dim) float32: tokens are
    whitespace-split, hashed (md5, stable across processes — NOT
    python's seeded ``hash``), bag-of-tokens accumulated into a
    ``2**16``-bucket sparse vector, projected by a seed-derived
    Gaussian matrix, then L2-normalized.  Pure function of (texts,
    dim, seed) — the property the determinism tests assert.
    """

    def __init__(self, dim: int, seed: int):
        import numpy as np

        self.dim = dim
        # the "model load": big-ish allocation done once per worker
        rng = np.random.default_rng(seed)
        self.proj = rng.standard_normal((1 << 16, dim)).astype("float32")

    def encode(self, texts):
        import hashlib

        import numpy as np

        out = np.zeros((len(texts), self.dim), dtype="float32")
        for i, t in enumerate(texts):
            if not t:
                continue
            acc = np.zeros(self.dim, dtype="float32")
            for tok in t.split(" "):
                h = int.from_bytes(
                    hashlib.md5(tok.encode()).digest()[:4], "little"
                ) & 0xFFFF
                acc += self.proj[h]
            n = float(np.linalg.norm(acc))
            if n > 0.0:
                out[i] = acc / n
        return out


def embed_texts(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "embedding",
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Attach an ``array<float>`` embedding column computed by the
    lazily-initialized per-worker model.  Null/empty text embeds to the
    zero vector (kept, not dropped — filtering is the caller's policy).

    Scale shape: pure map stage — no shuffle, Arrow batches both ways,
    model initialized once per python worker and reused across all its
    batches.  At 100 TB this is exactly the embedding backfill job: the
    only knobs are partition count (parallelism) and
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` (batch memory).
    """
    from pyspark.sql.types import ArrayType, FloatType, StructField, StructType

    schema = StructType(
        list(df.schema.fields) + [StructField(out_col, ArrayType(FloatType()), False)]
    )

    def run(batches):
        model = None  # lazy: first batch pays the load, the rest reuse
        for pdf in batches:
            if model is None:
                model = _Model(dim, seed)
            vecs = model.encode(["" if t is None else t for t in pdf[text_col]])
            pdf = pdf.copy()
            pdf[out_col] = list(vecs)
            yield pdf

    return df.mapInPandas(run, schema)
