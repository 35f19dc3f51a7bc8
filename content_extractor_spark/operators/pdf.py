"""PDF text/layout extraction operator (mapInPandas over binary payloads).

Same batch shape as the multimodal operators: opaque binary payload
column in, typed rows out. The decoder (kernel/pdftext.py) is pure
Python + stdlib zlib — real extraction for text-based / FlateDecode
PDFs, status='unsupported' for encrypted/exotic-filter files.

At scale, keep PDFs in their own table (they're large and the payload
must reach the Python worker) with small scan splits, and never
shuffle payloads — extract first, shuffle text.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame

PDF_TEXT_DDL = (
    "doc_id string, status string, text string, n_spans int, "
    "n_pages_streams int, n_bytes bigint, error string"
)

PDF_SPANS_DDL = (
    "doc_id string, idx int, text string, x double, y double, "
    "font_size double, page_stream int"
)


def extract_pdf_text(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """binary PDFs -> plain text + stats, one row per document."""
    from ..kernel import pdftext

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "doc_id", "status", "text", "n_spans", "n_pages_streams",
                "n_bytes", "error",
            )}
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                out["doc_id"].append(doc_id)
                if payload is None:
                    out["status"].append("error")
                    out["text"].append(None)
                    out["n_spans"].append(0)
                    out["n_pages_streams"].append(0)
                    out["n_bytes"].append(0)
                    out["error"].append("null payload")
                    continue
                data = bytes(payload)
                out["n_bytes"].append(len(data))
                if not pdftext.is_pdf(data):
                    out["status"].append("not_pdf")
                    out["text"].append(None)
                    out["n_spans"].append(0)
                    out["n_pages_streams"].append(0)
                    out["error"].append("missing %PDF header")
                    continue
                try:
                    spans = pdftext.extract_text_spans(data)
                    text = pdftext.extract_text(data)
                    out["status"].append("ok" if text else "unsupported")
                    out["text"].append(text or None)
                    out["n_spans"].append(len(spans))
                    out["n_pages_streams"].append(
                        len({s["page_stream"] for s in spans})
                    )
                    out["error"].append(
                        None if text else "no extractable text (encrypted/imaged?)"
                    )
                except Exception as exc:  # row error, never task failure
                    out["status"].append("error")
                    out["text"].append(None)
                    out["n_spans"].append(0)
                    out["n_pages_streams"].append(0)
                    out["error"].append(f"{type(exc).__name__}: {exc}")
            yield pd.DataFrame(out)

    return df.mapInPandas(run, schema=PDF_TEXT_DDL)


def extract_pdf_layout_spans(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """binary PDFs -> exploded layout spans (x/y/font-size per chunk)."""
    from ..kernel import pdftext

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in (
                "doc_id", "idx", "text", "x", "y", "font_size", "page_stream"
            )}
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    continue
                data = bytes(payload)
                if not pdftext.is_pdf(data):
                    continue
                try:
                    spans = pdftext.extract_text_spans(data)
                except Exception:
                    continue
                for i, s in enumerate(spans):
                    rows["doc_id"].append(doc_id)
                    rows["idx"].append(i)
                    rows["text"].append(s["text"])
                    rows["x"].append(s["x"])
                    rows["y"].append(s["y"])
                    rows["font_size"].append(s["font_size"])
                    rows["page_stream"].append(s["page_stream"])
            yield pd.DataFrame(rows)

    return df.mapInPandas(run, schema=PDF_SPANS_DDL)
