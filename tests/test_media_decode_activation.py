"""Activation test-double for the PIL-guarded real-decode branch
(round-3 verdict item 7): operators/multimodal._decode_real's PIL path
had never executed in this container (no PIL). A minimal fake PIL.Image
drives the real branch so its code is exercised — open(), the context
manager, width/height/n_frames extraction, and the batch rare-path that
dispatches non-OSMM buffers to it."""

import io

import pytest

from osm_hadoop_spark.operators import multimodal as M


class _FakeImg:
    def __init__(self, buf: bytes):
        # "decode": derive dims from the payload deterministically
        self.width = 100 + buf[0]
        self.height = 50 + buf[1]
        self.n_frames = 1 + (buf[2] % 3)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False


class _FakePIL:
    @staticmethod
    def open(fp):
        assert isinstance(fp, io.BytesIO)
        return _FakeImg(fp.read())


@pytest.fixture
def fake_pil(monkeypatch):
    monkeypatch.setattr(M, "_PILImage", _FakePIL)


def test_decode_real_branch_with_fake_pil(fake_pil):
    w, h, fr, kd = M._decode_real(bytes([7, 9, 4]))
    assert (w, h, fr, kd) == (107, 59, 2, 2)  # n_frames = 1 + (4 % 3)


def test_decode_batch_dispatches_non_osmm_to_real_codec(fake_pil):
    """Mixed batch: OSMM stub headers stay on the vectorized path, the
    foreign buffer takes the real-codec probe — same output frame."""
    osmm = M.MEDIA_MAGIC + bytes([10, 0, 20, 0, 3, 0, 1, 0]) + b"body"
    foreign = bytes([1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13])
    out = M._decode_batch([osmm, foreign, osmm])
    assert out.loc[0, "width"] == 10 and out.loc[0, "height"] == 20
    assert out.loc[1, "width"] == 101 and out.loc[1, "height"] == 52
    assert out.loc[1, "n_frames"] == 1 + (3 % 3)
    assert out.loc[1, "kind"] == 2
    assert out.loc[1, "n_bytes"] == len(foreign)
    assert out.loc[2, "n_frames"] == 3


def test_decode_real_without_pil_keeps_stub_boundary(monkeypatch):
    monkeypatch.setattr(M, "_PILImage", None)
    with pytest.raises(NotImplementedError, match="not available"):
        M._decode_real(b"\x89PNGxxxx")
