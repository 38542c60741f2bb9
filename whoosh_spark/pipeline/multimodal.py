"""Multimodal columns: opaque binary payloads + typed metadata.

Pattern for image/audio/video at 100 TB: the asset is an opaque ``binary``
column (or an object-store URI), metadata is a typed struct column, and all
decode/feature work runs as Arrow-batched functions over ``mapInArrow`` /
``mapInPandas`` so bytes never cross a Python row boundary one at a time.

The actual codec libraries (Pillow, torchaudio, ffmpeg) are NOT in this
container, so the decode step is STUBBED two ways:
- :func:`decode_image` raises NotImplementedError unless PIL is importable
  (import-gated real path, signature and batch shape are the real ones);
- :func:`fake_decode_meta` is a deterministic stand-in that parses
  "header" fields out of the payload bytes — it exercises the full Spark
  plumbing (binary column -> Arrow batch -> numpy -> struct column) and is
  oracle-checkable because the synthetic payload derives from md5(text),
  which DuckDB can reproduce bit-for-bit.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def synth_assets(docs: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Deterministic fake binary assets: payload = unhex(md5(text)) (16
    bytes standing in for an encoded image), media_type cycles by doc_id."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.element_at(
            F.array(F.lit("image/png"), F.lit("image/jpeg"), F.lit("audio/wav")),
            (F.col(id_col) % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.unhex(F.md5(F.col(text_col))).alias("payload"),
    )


def fake_decode_meta(assets: DataFrame) -> DataFrame:
    """Parse deterministic 'header' metadata from payload bytes, batched.

    width  = big-endian uint16 of bytes [0:2]  (mod 4096)
    height = big-endian uint16 of bytes [2:4]  (mod 4096)
    n_bytes = payload length
    This is exactly the shape of a real header sniffer (PNG IHDR / JPEG
    SOF) minus the codec; swap the arithmetic for struct.unpack on real
    files and nothing else changes.
    """
    import pyarrow as pa

    out_schema = "doc_id long, media_type string, width int, height int, n_bytes int"

    def gen(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        for batch in batches:
            if batch.num_rows == 0:
                continue
            ids = batch.column(0).to_numpy(zero_copy_only=False)
            mtypes = batch.column(1)
            payload = batch.column(2)
            # zero-copy view of all payload bytes + offsets
            buf = np.frombuffer(payload.buffers()[2], dtype=np.uint8)
            offs = np.frombuffer(payload.buffers()[1], dtype=np.int32)[
                payload.offset : payload.offset + len(ids) + 1
            ]
            starts = offs[:-1].astype(np.int64)
            lens = (offs[1:] - offs[:-1]).astype(np.int32)
            b0 = buf[starts].astype(np.int32)
            b1 = buf[starts + 1].astype(np.int32)
            b2 = buf[starts + 2].astype(np.int32)
            b3 = buf[starts + 3].astype(np.int32)
            width = ((b0 << 8) | b1) % 4096
            height = ((b2 << 8) | b3) % 4096
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids, type=pa.int64()),
                    mtypes,
                    pa.array(width, type=pa.int32()),
                    pa.array(height, type=pa.int32()),
                    pa.array(lens, type=pa.int32()),
                ],
                names=["doc_id", "media_type", "width", "height", "n_bytes"],
            )

    return assets.select("doc_id", "media_type", "payload").mapInArrow(gen, out_schema)


def decode_image(assets: DataFrame, resize: tuple[int, int] | None = None) -> DataFrame:
    """REAL decode path (import-gated): payload -> decoded pixel features.

    Raises NotImplementedError in this container (no PIL); the mapInPandas
    body shows the production shape: Arrow batch of binaries -> PIL decode
    -> numpy stack -> feature columns.
    """
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:  # pragma: no cover - container has no PIL
        raise NotImplementedError(
            "image decode needs Pillow; this environment stubs it — use "
            "fake_decode_meta() for the plumbing-equivalent deterministic path"
        ) from exc

    import io

    import pandas as pd

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:  # pragma: no cover
        for pdf in batches:
            rows = []
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                img = Image.open(io.BytesIO(payload))
                if resize:
                    img = img.resize(resize)
                arr = np.asarray(img, dtype=np.float32)
                rows.append((did, img.width, img.height, float(arr.mean())))
            yield pd.DataFrame(rows, columns=["doc_id", "width", "height", "mean_pixel"])

    return assets.select("doc_id", "payload").mapInPandas(
        decode, "doc_id long, width int, height int, mean_pixel double"
    )


def sample_frames(assets: DataFrame, frame_bytes: int = 4,
                  stride: int = 2) -> DataFrame:
    """Frame-sampling plumbing for video payloads -> one row per sampled
    frame (doc_id, frame_idx, frame:binary).

    Treats the binary as a fixed-size frame sequence and emits every
    ``stride``-th frame as its own row — the 1->N row explosion a real
    video sampler produces (swap the byte-slicing for an ffmpeg/pyav
    keyframe decode and the schema, batching, and partitioning are
    unchanged). Deterministic over the synthetic assets, so it carries an
    exact DuckDB oracle (substr over the same payload bytes)."""
    import pyarrow as pa

    out_schema = "doc_id long, frame_idx int, frame binary"

    def gen(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        for batch in batches:
            if batch.num_rows == 0:
                continue
            ids = batch.column(0).to_numpy(zero_copy_only=False)
            payload = batch.column(1)
            out_ids, out_idx, out_frames = [], [], []
            for i in range(len(ids)):
                raw = payload[i].as_py()
                n_frames = len(raw) // frame_bytes
                for fi in range(0, n_frames, stride):
                    out_ids.append(ids[i])
                    out_idx.append(fi)
                    out_frames.append(raw[fi * frame_bytes:(fi + 1) * frame_bytes])
            yield pa.RecordBatch.from_arrays(
                [pa.array(out_ids, type=pa.int64()),
                 pa.array(out_idx, type=pa.int32()),
                 pa.array(out_frames, type=pa.binary())],
                names=["doc_id", "frame_idx", "frame"],
            )

    return assets.select("doc_id", "payload").mapInArrow(gen, out_schema)
