"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video assets travel as opaque `binary` columns (or
`media_ref` pointers) with typed metadata structs. Decode /
feature-extract / resize / frame-sample run as Arrow-batched UDFs over
``mapInPandas`` — the Spark-side plumbing (schema, batch shape,
partitioning) is real and tested; the codec step itself is STUBBED
because no image/audio libraries exist in this container:

  * ``decode_stub_mode="fake"`` produces deterministic fake features
    (seeded by the payload digest) so pipelines are testable
    end-to-end;
  * ``decode_stub_mode="raise"`` raises NotImplementedError where a
    real decoder (PIL/ffmpeg/torchaudio) would plug in.

At scale: media rows are orders of magnitude larger than text rows —
keep them in their own table partitioned by (modality, bucket), size
``spark.sql.files.maxPartitionBytes`` down (e.g. 32m) so a scan split
of binaries fits the Python worker, and never shuffle raw payloads
(extract features first, shuffle features).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame

MEDIA_META_DDL = (
    "media_ref string, modality string, mime string, width int, height int, "
    "duration_ms int, n_bytes bigint"
)

IMAGE_FEATURES_DDL = (
    "media_ref string, n_bytes bigint, sha256 string, "
    "feat array<float>, status string, error string"
)

_FEAT_DIM = 8


def _fake_decode(payload: bytes):
    """Deterministic stand-in for image decode + feature extraction.

    Features = first bytes of sha256(payload) scaled to [0,1) — stable
    across runs/machines, so tests can pin values.
    """
    digest = hashlib.sha256(payload).digest()
    return [b / 255.0 for b in digest[:_FEAT_DIM]]


def extract_image_features(
    df: DataFrame,
    payload_col: str = "payload",
    ref_col: str = "media_ref",
    decode_stub_mode: str = "fake",
) -> DataFrame:
    """binary payloads -> fixed-dim feature vectors via mapInPandas.

    Real decoders replace `_fake_decode`; everything else (Arrow
    batching, schema, error-as-status rows) is production plumbing.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_ref": [], "n_bytes": [], "sha256": [],
                "feat": [], "status": [], "error": [],
            }
            for ref, payload in zip(pdf[ref_col], pdf[payload_col]):
                out["media_ref"].append(ref)
                if payload is None:
                    out["n_bytes"].append(0)
                    out["sha256"].append(None)
                    out["feat"].append(None)
                    out["status"].append("error")
                    out["error"].append("null payload")
                    continue
                data = bytes(payload)
                out["n_bytes"].append(len(data))
                out["sha256"].append(hashlib.sha256(data).hexdigest())
                try:
                    if decode_stub_mode == "raise":
                        raise NotImplementedError(
                            "image decode requires PIL/libvips — not in this container"
                        )
                    out["feat"].append(_fake_decode(data))
                    out["status"].append("ok")
                    out["error"].append(None)
                except NotImplementedError as exc:
                    out["feat"].append(None)
                    out["status"].append("unsupported")
                    out["error"].append(str(exc))
            yield pd.DataFrame(out)

    return df.mapInPandas(run, schema=IMAGE_FEATURES_DDL)
