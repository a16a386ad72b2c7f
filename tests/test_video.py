"""utils/video.py: encoder fallbacks and channel-order correctness."""
import os
import sys
import types

import numpy as np

from factored_neus_tpu.utils.video import write_video


def _frames():
    frames = []
    for i in range(4):
        f = np.zeros((16, 24, 3), np.uint8)
        f[..., 0] = 200          # R
        f[..., 1] = 90           # G
        f[..., 2] = 30 + i       # B
        frames.append(f)
    return frames


def test_write_video_produces_artifact(tmp_path):
    out = write_video(str(tmp_path / "v.mp4"), _frames(), fps=10)
    if os.path.isdir(out):
        assert len(os.listdir(out)) == 4
    else:
        assert os.path.getsize(out) > 0


def test_write_video_png_fallback_channel_order(tmp_path, monkeypatch):
    """With no encoder available, the PNG frame-dir fallback must engage
    AND preserve channel order (both for rgb and bgr input frames)."""
    raiser = types.ModuleType("imageio")

    class _V2(types.ModuleType):
        def __getattr__(self, name):
            raise ImportError("no imageio in this test")
    raiser.v2 = _V2("imageio.v2")
    monkeypatch.setitem(sys.modules, "imageio", raiser)
    monkeypatch.setitem(sys.modules, "imageio.v2", raiser.v2)

    cv_stub = types.ModuleType("cv2")

    class _DeadWriter:
        def __init__(self, *a, **k):
            pass

        def isOpened(self):
            return False           # the silent-no-encoder cv2 behavior

        def release(self):
            pass
    cv_stub.VideoWriter = _DeadWriter
    cv_stub.VideoWriter_fourcc = lambda *a: 0
    # imwrite used by the PNG fallback (data.images routes through cv2
    # when importable, BGR convention like the reference's cv.imwrite)
    written = {}

    def fake_imwrite(path, arr):
        with open(path, "wb") as f:
            f.write(b"png")
        written[os.path.basename(path)] = np.array(arr)
        return True
    cv_stub.imwrite = fake_imwrite
    monkeypatch.setitem(sys.modules, "cv2", cv_stub)
    from factored_neus_tpu.data import images as IMG
    monkeypatch.setattr(IMG, "_cv", cv_stub, raising=False)

    out = write_video(str(tmp_path / "v.mp4"), _frames(), fps=10)
    assert os.path.isdir(out) and len(written) == 4
    # input frames were RGB(200,90,30+i); the fallback writes via the
    # BGR-convention imwrite, so on disk the first channel must be B
    arr = written["0000.png"]
    assert arr[0, 0, 0] == 30 and arr[0, 0, 2] == 200

    written.clear()
    bgr_frames = [f[..., ::-1].copy() for f in _frames()]   # now BGR input
    out2 = write_video(str(tmp_path / "v2.mp4"), bgr_frames, fps=10,
                       bgr=True)
    assert os.path.isdir(out2) and len(written) == 4
    arr = written["0000.png"]
    assert arr[0, 0, 0] == 30 and arr[0, 0, 2] == 200
