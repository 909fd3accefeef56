"""Multimodal (binary-payload) column processing.

Treats media as opaque ``binary`` columns with typed metadata, the
way the spatial engine treats raster tiles (model.py MEDIA_SCHEMA).
The image/audio codec libraries are NOT in this container, so the
actual decode is STUBBED (deterministic fake, clearly marked), but all
the Ray-side plumbing — schema, actor-pool stage signature, batch
sizing, output layout — is real and tested.

* ``make_media_table``   — derive a (doc_id, media, media_type, n_bytes)
                           binary-column table from the documents table
                           (UTF-8 payloads stand in for image bytes).
* ``StubImageDecoder``   — actor-pool ``map_batches`` stage shaped like
                           a real decoder: per-actor "codec init" in
                           __init__, per-batch decode in __call__.
                           ``decode_real`` raises NotImplementedError
                           (no PIL/libjpeg here); ``_decode_fake`` is
                           the deterministic stand-in: byte histogram →
                           16-bin "feature vector" + fake (w, h).
* ``media_features``     — the end-to-end pipeline over the stub.

At 100 TB: payload batches must be SMALL (batch_size counts rows, not
bytes — 1 MB images × 4096-row default batch = 4 GB per batch heap).
``media_features`` sets batch_size explicitly from a payload budget,
the pattern to keep.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

MEDIA_BATCH_BYTES = 64 << 20  # per-batch payload budget


def make_media_table(sf_dir: str) -> ray.data.Dataset:
    """documents → binary media column (text bytes as stand-in
    payload) + typed metadata."""
    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "source"])

    def to_media(batch: pa.Table) -> pa.Table:
        payloads = [t.encode("utf-8") for t in batch["text"].to_pylist()]
        return pa.table({
            "doc_id": batch["doc_id"],
            "media": pa.array(payloads, pa.binary()),
            "media_type": pa.array(["image/fake"] * batch.num_rows),
            "n_bytes": pa.array([len(p) for p in payloads], pa.int64()),
        })

    return docs.map_batches(to_media, batch_format="pyarrow")


class StubImageDecoder:
    """Actor-pool decode stage. Real decoders load their codec once per
    actor here (model weights, libjpeg handles, ffmpeg contexts) —
    the __init__/__call__ split is the load-bearing part."""

    N_BINS = 16

    def __init__(self, target_size: tuple[int, int] = (32, 32)):
        # real impl: self.codec = PIL/torchvision/ffmpeg init (once)
        self.target_size = target_size
        self.edges = np.linspace(0, 256, self.N_BINS + 1)

    def decode_real(self, payload: bytes) -> np.ndarray:
        raise NotImplementedError(
            "image codecs are not available in this environment; "
            "plug PIL.Image.open/ffmpeg here on a real cluster")

    def _decode_fake(self, payload: bytes) -> tuple[np.ndarray, int, int]:
        """Deterministic stand-in: 16-bin byte histogram as the
        'pixel' feature; fake dimensions derived from content hash."""
        b = np.frombuffer(payload, dtype=np.uint8)
        hist, _ = np.histogram(b, bins=self.edges)
        h = hashlib.md5(payload).digest()
        w, ht = 16 + h[0] % 240, 16 + h[1] % 240
        return hist.astype(np.int64), w, ht

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats, ws, hs = [], [], []
        for p in batch["media"].to_pylist():
            f, w, h = self._decode_fake(p)
            feats.append(f)
            ws.append(w)
            hs.append(h)
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_bytes": batch["n_bytes"],
            "width": pa.array(ws, pa.int32()),
            "height": pa.array(hs, pa.int32()),
            "feature": pa.array(
                feats, pa.list_(pa.int64(), self.N_BINS)),
        })


def media_features(sf_dir: str) -> pd.DataFrame:
    """media table → decoded feature rows. Batch size derived from the
    payload budget (rows ≈ budget / avg payload), the multimodal batch
    sizing rule."""
    media = make_media_table(sf_dir)
    # sf docs are ~300 B; a real image pipeline would probe avg size
    avg_payload = 512
    batch_size = max(32, min(4096, MEDIA_BATCH_BYTES // avg_payload))
    feats = media.map_batches(
        StubImageDecoder, fn_constructor_kwargs={},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=(1, 4))
    out = feats.to_pandas()
    out["feat_sum"] = [int(np.sum(f)) for f in out["feature"]]
    out = out.drop(columns=["feature"])
    return out.sort_values("doc_id").reset_index(drop=True)


MEDIA_BYTES_SQL = """
SELECT doc_id, strlen(text) AS n_bytes
FROM documents ORDER BY doc_id
"""

#: full oracle for the stub decode pipeline: the fake dims come from
#: the first two md5 bytes of the payload (== md5 of the UTF-8 text,
#: which DuckDB's md5() also hashes) and the 16-bin byte histogram
#: always sums to the payload length.
MEDIA_FEATURES_SQL = """
SELECT doc_id, strlen(text) AS n_bytes,
       16 + ('0x' || substr(md5(text), 1, 2))::INT % 240 AS width,
       16 + ('0x' || substr(md5(text), 3, 2))::INT % 240 AS height,
       strlen(text) AS feat_sum
FROM documents ORDER BY doc_id
"""


def media_bytes(sf_dir: str) -> pd.DataFrame:
    """SQL-verifiable slice of the media pipeline: payload byte counts
    straight off the binary column."""
    media = make_media_table(sf_dir)
    out = media.select_columns(["doc_id", "n_bytes"]).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# batched "model inference": documents -> embeddings (stub model, real
# actor-pool plumbing — load-once weights, batched matmul per call)
# ---------------------------------------------------------------------------

class StubEmbedder:
    """Actor-pool embedding 'model'. A real deployment loads weights
    here (sentence-transformer / ONNX session) ONCE per actor; the stub
    uses a seeded random projection over hashed bag-of-words — fully
    deterministic across actors and runs, with the same batched-matmul
    shape a real encoder has."""

    DIM = 32
    VOCAB_BUCKETS = 512

    def __init__(self, seed: int = 5):
        rng = np.random.RandomState(seed)
        # "model weights": fixed projection, drawn once per actor
        self.proj = rng.normal(size=(self.VOCAB_BUCKETS, self.DIM)) \
            .astype(np.float32)

    #: per-process token->bucket cache (vocab ≪ token stream; cleared
    #: wholesale at the cap so long-lived actors stay bounded)
    _tok_bucket: dict[str, int] = {}
    _TOK_CACHE_CAP = 1 << 20

    def _bow(self, texts: list[str]) -> np.ndarray:
        out = np.zeros((len(texts), self.VOCAB_BUCKETS), dtype=np.float32)
        cache = StubEmbedder._tok_bucket
        if len(cache) > self._TOK_CACHE_CAP:
            cache.clear()
        rows: list[int] = []
        buckets: list[int] = []
        for i, t in enumerate(texts):
            for tok in t.split():
                b = cache.get(tok)
                if b is None:
                    b = int(hashlib.md5(tok.encode()).hexdigest()[:8],
                            16) % self.VOCAB_BUCKETS
                    cache[tok] = b
                rows.append(i)
                buckets.append(b)
        if rows:
            np.add.at(out, (np.asarray(rows), np.asarray(buckets)), 1.0)
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        emb = self._bow(texts) @ self.proj  # ONE matmul per batch
        norms = np.linalg.norm(emb, axis=1, keepdims=True)
        emb = emb / np.where(norms == 0, 1.0, norms)
        return pa.table({
            "doc_id": batch["doc_id"],
            "embedding": pa.array(list(emb.astype(np.float32)),
                                  pa.list_(pa.float32(), self.DIM)),
        })


def embed_documents_ds(sf_dir: str) -> "ray.data.Dataset":
    """Lazy (doc_id, embedding) Dataset via the actor-pool stub model
    — the 100 TB form (sink with ``write_doc_output`` /
    ``embed_documents_to_embeddings``; never driver-wide)."""
    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"])
    return docs.map_batches(StubEmbedder, fn_constructor_kwargs={},
                            batch_format="pyarrow", batch_size=256,
                            concurrency=(1, 4))


def embed_documents(sf_dir: str) -> pd.DataFrame:
    """Gate adapter over ``embed_documents_ds``: per-doc embedding
    checksums (deterministic), small enough for the driver."""

    def checksum(batch: pa.Table) -> pa.Table:
        m = np.stack([np.asarray(e, dtype=np.float32)
                      for e in batch["embedding"].to_pylist()])
        return pa.table({
            "doc_id": batch["doc_id"],
            "dim": pa.array(np.full(len(m), m.shape[1], np.int64)),
            "embed_sum": pa.array(
                np.round(m.sum(axis=1, dtype=np.float64), 4)),
        })

    pdf = (embed_documents_ds(sf_dir)
           .map_batches(checksum, batch_format="pyarrow").to_pandas())
    return pdf.sort_values("doc_id").reset_index(drop=True)


def embed_documents_to_embeddings(sf_dir: str, out_dir: str) -> dict:
    """Pipeline composition: documents -> stub encoder -> an
    embeddings TABLE on disk in the exact shape ``simsearch`` reads
    (vec_id:int64, embedding:fixed_size_list<float>, label:string), as
    a ``{out_dir}/embeddings.parquet/`` directory of per-block parts.
    Downstream ANN then runs unchanged with ``out_dir`` as its sf_dir:
    ``ann_topk(out_dir)`` / ``ann_lsh(out_dir)`` consume the generated
    table. vec_id is the int64 doc_id when the corpus uses integer ids
    (the testdata shape), else its stable 64-bit content hash; label
    carries the source doc_id for joins."""
    from .dedup import _h64
    from .util import write_doc_output

    def to_embeddings(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        if pa.types.is_integer(batch["doc_id"].type):
            vec_id = np.asarray(ids, dtype=np.int64)
        else:
            vec_id = np.fromiter((_h64(str(d)) for d in ids),
                                 dtype=np.int64, count=len(ids))
        return pa.table({
            "vec_id": pa.array(vec_id),
            "embedding": batch["embedding"],
            "label": pa.array([str(d) for d in ids], pa.string()),
        })

    emb = embed_documents_ds(sf_dir).map_batches(
        to_embeddings, batch_format="pyarrow")
    return write_doc_output(
        emb, os.path.join(out_dir, "embeddings.parquet"))


# ---------------------------------------------------------------------------
# frame sampling — flat-map expansion over "video" payloads
# ---------------------------------------------------------------------------

FRAME_BYTES = 64    # stub frame size (a real pipeline reads container
                    # metadata; the expansion/row-fanout plumbing is
                    # identical)
FRAME_STRIDE = 4    # keep every 4th frame


class StubFrameSampler:
    """Actor-pool frame-sampling stage: treat each binary payload as a
    fixed-frame-size 'video', emit one ROW per sampled frame (the
    flat-map row-fanout every video pipeline needs — one input row
    becomes n_frames/stride output rows). A real impl opens an ffmpeg
    context per actor in __init__ and decodes keyframes in __call__;
    the stub slices byte windows, so the fanout, schema and batch
    accounting are real while the codec is a deterministic fake."""

    def __init__(self, frame_bytes: int = FRAME_BYTES,
                 stride: int = FRAME_STRIDE):
        # real impl: self.ctx = ffmpeg/PyAV open (once per actor)
        self.frame_bytes = frame_bytes
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        fb = self.frame_bytes
        ids, idxs, sizes, sums = [], [], [], []
        for d, p in zip(batch["doc_id"].to_pylist(),
                        batch["media"].to_pylist()):
            n_frames = (len(p) + fb - 1) // fb
            for fi in range(0, n_frames, self.stride):
                frame = p[fi * fb:(fi + 1) * fb]
                ids.append(d)
                idxs.append(fi)
                sizes.append(len(frame))
                sums.append(int(np.frombuffer(frame, np.uint8)
                                .astype(np.int64).sum()))
        return pa.table({
            "doc_id": pa.array(ids, batch["doc_id"].type),
            "frame_idx": pa.array(idxs, pa.int64()),
            "frame_bytes": pa.array(sizes, pa.int64()),
            "frame_checksum": pa.array(sums, pa.int64()),
        })


def frame_sample(sf_dir: str) -> pd.DataFrame:
    """media table → sampled frame rows (every FRAME_STRIDE-th
    FRAME_BYTES window). Small batch size per the payload-budget rule
    — the output is BIGGER than the input (row fanout), so the batch
    budget must cover payload x fanout."""
    media = make_media_table(sf_dir)
    batch_size = max(32, min(2048, MEDIA_BATCH_BYTES // (512 * 4)))
    frames = media.map_batches(
        StubFrameSampler, fn_constructor_kwargs={},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=(1, 4))
    out = frames.to_pandas()
    return out.sort_values(["doc_id", "frame_idx"]).reset_index(drop=True)


def _frame_sample_sql() -> str:
    fb, stride = FRAME_BYTES, FRAME_STRIDE
    return f"""
WITH bt AS (
  SELECT doc_id, hex(encode(text)) AS hx, strlen(text)::BIGINT AS n,
         (strlen(text)::BIGINT + {fb - 1}) // {fb} AS n_frames
  FROM documents),
f AS (
  SELECT doc_id, hx, n, unnest(range(0, n_frames)) AS frame_idx FROM bt)
SELECT doc_id, frame_idx,
       LEAST({fb}, n - frame_idx * {fb})::BIGINT AS frame_bytes,
       list_sum(list_transform(
           range(0, LEAST({fb}, n - frame_idx * {fb})::INT),
           i -> ('0x' || substr(hx, 2 * (frame_idx * {fb} + i) + 1,
                                2))::INT))::BIGINT AS frame_checksum
FROM f WHERE frame_idx % {stride} = 0
ORDER BY doc_id, frame_idx
"""


FRAME_SAMPLE_SQL = _frame_sample_sql()
