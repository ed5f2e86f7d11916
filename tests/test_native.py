"""C++ host runtime (ggs_tpu/native): PNG encoder, async frame writer, CSV."""
import os

import numpy as np
import pytest

from ggs_tpu import native


pytestmark = pytest.mark.skipif(
    not native.available(), reason="ggs_native failed to build (no g++/zlib)"
)


def test_png_roundtrip(tmp_path):
    img = (np.random.default_rng(0).random((37, 53, 3)) * 255).astype(np.uint8)
    path = str(tmp_path / "x.png")
    native.write_png_rgb8(path, img)
    from PIL import Image

    back = np.asarray(Image.open(path))
    assert back.shape == img.shape
    np.testing.assert_array_equal(back, img)


def test_async_frame_writer(tmp_path):
    img = (np.random.default_rng(1).random((16, 16, 3)) * 255).astype(np.uint8)
    with native.FrameWriter(max_queue=3) as fw:
        for i in range(12):  # more than the queue bound: submit must block, not drop
            fw.submit(str(tmp_path / f"f_{i}.png"), img)
        fw.flush()
        assert fw.errors == 0
    files = sorted(os.listdir(tmp_path))
    assert len(files) == 12
    from PIL import Image

    np.testing.assert_array_equal(np.asarray(Image.open(tmp_path / files[0])), img)


def test_csv_append(tmp_path):
    path = str(tmp_path / "m.csv")
    native.csv_append(path, "gen,best", [0, 0.5])
    native.csv_append(path, "gen,best", [1, 0.25])
    lines = open(path).read().strip().split("\n")
    assert lines[0] == "gen,best"
    assert lines[1].startswith("0,") and lines[2].startswith("1,")


def test_io_uses_native_writer(tmp_path):
    """save_image_u8 routes through the C++ encoder and stays PIL-readable."""
    import jax.numpy as jnp

    from ggs_tpu.utils import io as io_mod

    img = jnp.linspace(0, 1, 8 * 8 * 3).reshape(8, 8, 3)
    path = str(tmp_path / "img.png")
    io_mod.save_image_u8(img, path)
    from PIL import Image

    back = np.asarray(Image.open(path))
    assert back.shape == (8, 8, 3)


def test_apng_writer_roundtrip(tmp_path):
    """Native streaming APNG: PIL must see an animated PNG with the right
    frame count, size, and per-frame pixels."""
    native = pytest.importorskip("ggs_tpu.native")
    if not native.available():
        pytest.skip("native runtime unavailable")
    from PIL import Image

    path = str(tmp_path / "anim.apng")
    w = native.ApngWriter(path, 24, 32, fps=12)
    for i in range(4):
        a = np.zeros((24, 32, 3), np.uint8)
        a[:, : (i + 1) * 8] = [200, 10 + 20 * i, 5]
        w.add(a)
    assert w.close()

    im = Image.open(path)
    assert im.format == "PNG" and im.is_animated and im.n_frames == 4
    assert im.size == (32, 24)
    im.seek(2)
    arr = np.asarray(im.convert("RGB"))
    assert arr[0, 0].tolist() == [200, 50, 5]
    assert arr[0, 31].tolist() == [0, 0, 0]


def test_assemble_apng_from_frames(tmp_path):
    """utils.io.assemble_apng stitches saved frame PNGs into one animation."""
    native = pytest.importorskip("ggs_tpu.native")
    if not native.available():
        pytest.skip("native runtime unavailable")
    from PIL import Image

    from ggs_tpu.utils import io as io_mod

    vdir = str(tmp_path / "frames")
    for g in (0, 5, 10):
        img = np.full((16, 16, 3), g * 20, np.uint8)
        native.write_png_rgb8(f"{vdir}/ga_{g:06d}.png", img)
    out = io_mod.assemble_apng(vdir, "ga", str(tmp_path / "ga_anim.apng"), fps=5)
    assert out is not None
    im = Image.open(out)
    assert im.is_animated and im.n_frames == 3
