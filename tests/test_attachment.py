"""ingest-attachment processor (AttachmentProcessor wrapping Tika —
here: real text/html extraction, magic-sniffed stubs for binary
formats)."""

import base64

import pandas as pd
import pytest

from elasticsearch_ray.ops.processors import _REGISTRY, AttachmentProcessor


def _b(data: bytes) -> str:
    return base64.b64encode(data).decode()


def test_plain_and_html_extraction():
    p = AttachmentProcessor(field="data")
    df = pd.DataFrame({"data": [
        _b("the quick brown fox and the dog".encode()),
        _b(b"<html><body><h1>Title</h1><p>der und das ist</p></body></html>"),
    ]})
    out = p(df.copy())
    assert out.loc[0, "attachment.content"].startswith("the quick")
    assert out.loc[0, "attachment.content_type"] == "text/plain"
    assert out.loc[0, "attachment.language"] == "en"
    assert out.loc[0, "attachment.content_length"] == len(
        "the quick brown fox and the dog")
    assert out.loc[1, "attachment.content_type"] == "text/html"
    assert "Title" in out.loc[1, "attachment.content"]
    assert "<p>" not in out.loc[1, "attachment.content"]
    assert out.loc[1, "attachment.language"] == "de"


def test_binary_magics_detected_not_extracted():
    p = AttachmentProcessor(field="data")
    df = pd.DataFrame({"data": [
        _b(b"%PDF-1.7 rest"), _b(b"PK\x03\x04zipzip"),
        _b(b"\xd0\xcf\x11\xe0ole"), _b(b"{\\rtf1 hi"),
    ]})
    out = p(df.copy())
    assert out["attachment.content_type"].tolist() == [
        "application/pdf", "application/zip",
        "application/x-ole-storage", "application/rtf"]
    assert out["attachment.content"].isna().all()
    assert out["attachment.error"].str.contains("no extractor").all()


def test_indexed_chars_cap_and_properties_subset():
    p = AttachmentProcessor(field="data", indexed_chars=5,
                            properties=["content", "content_length"])
    out = p(pd.DataFrame({"data": [_b(b"abcdefghij")]}))
    assert out.loc[0, "attachment.content"] == "abcde"
    assert out.loc[0, "attachment.content_length"] == 5
    assert "attachment.language" not in out.columns
    # -1 = unlimited (the reference's sentinel)
    p2 = AttachmentProcessor(field="data", indexed_chars=-1)
    assert p2(pd.DataFrame({"data": [_b(b"abcdefghij")]})) \
        .loc[0, "attachment.content"] == "abcdefghij"


def test_missing_field_semantics():
    with pytest.raises(ValueError, match="null"):
        AttachmentProcessor(field="data")(
            pd.DataFrame({"data": [None]}))
    out = AttachmentProcessor(field="data", ignore_missing=True)(
        pd.DataFrame({"data": [None, _b(b"ok text")]}))
    assert pd.isna(out.loc[0, "attachment.content"])
    assert out.loc[1, "attachment.content"] == "ok text"


def test_registered_and_target_field():
    assert _REGISTRY["attachment"] is AttachmentProcessor
    out = AttachmentProcessor(field="d", target_field="file")(
        pd.DataFrame({"d": [_b(b"x")]}))
    assert "file.content" in out.columns


def test_error_column_schema_consistent_across_batches(ray_session):
    """Review r5 #5: the error column must exist in EVERY batch (None-
    filled) or Ray blocks get divergent schemas."""
    import ray

    p = AttachmentProcessor(field="data")
    df = pd.DataFrame({"data": [_b(b"plain ok")] * 4
                       + [_b(b"%PDF-1.7 x")] * 4})
    ds = ray.data.from_pandas(df).repartition(2).map_batches(
        p, batch_format="pandas")
    out = ds.to_pandas()
    assert "attachment.error" in out.columns
    assert out["attachment.error"].notna().sum() == 4
    clean = AttachmentProcessor(field="data")(
        pd.DataFrame({"data": [_b(b"ok")]}))
    assert "attachment.error" in clean.columns
    assert clean["attachment.error"].isna().all()
