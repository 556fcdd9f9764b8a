"""Native IO runtime tests: csv parse, PGM decode, SPSC prefetcher."""
import os

import numpy as np
import pytest

native = pytest.importorskip("xivo_tpu.native")


@pytest.fixture(scope="module")
def lib():
    l = native.get_lib()
    if l is None:
        pytest.skip("no compiler available")
    return l


def write_pgm(path, img, maxv=255):
    with open(path, "wb") as f:
        f.write(f"P5\n# comment\n{img.shape[1]} {img.shape[0]}\n"
                f"{maxv}\n".encode())
        if maxv < 256:
            f.write(img.astype(np.uint8).tobytes())
        else:
            f.write(img.astype(">u2").tobytes())


def test_parse_imu_csv(lib, tmp_path):
    p = tmp_path / "data.csv"
    rows = ["#ts,gx,gy,gz,ax,ay,az"]
    rng = np.random.default_rng(0)
    vals = rng.standard_normal((50, 6))
    for i in range(50):
        ns = 1000000000 + i * 5000000
        rows.append(",".join([str(ns)] + [f"{v:.9f}" for v in vals[i]]))
    p.write_text("\n".join(rows) + "\n")
    out = native.parse_imu_csv(str(p))
    assert out.shape == (50, 7)
    assert np.allclose(out[:, 0], 1.0 + np.arange(50) * 0.005)
    assert np.allclose(out[:, 1:], vals, atol=1e-9)


def test_load_pgm(lib, tmp_path):
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (48, 64)).astype(np.uint8)
    p = tmp_path / "img.pgm"
    write_pgm(str(p), img)
    out = native.load_pgm(str(p))
    assert out.shape == (48, 64)
    assert np.array_equal(out, img.astype(np.float32))
    # 16-bit rescales to 0..255 (cv::IMREAD_GRAYSCALE contract) so FAST
    # thresholds are bit-depth independent
    img16 = rng.integers(0, 65535, (32, 40)).astype(np.uint16)
    p2 = tmp_path / "img16.pgm"
    write_pgm(str(p2), img16, maxv=65535)
    out16 = native.load_pgm(str(p2))
    assert np.allclose(out16, img16.astype(np.float32) / 257.0, atol=1e-3)
    assert out16.max() <= 255.0


def test_prefetcher_streams_in_order(lib, tmp_path):
    rng = np.random.default_rng(2)
    imgs = []
    paths = []
    for i in range(20):
        img = rng.integers(0, 255, (24, 32)).astype(np.uint8)
        p = str(tmp_path / f"f{i}.pgm")
        write_pgm(p, img)
        imgs.append(img)
        paths.append(p)
    pf = native.ImagePrefetcher(paths, capacity=4)
    got = list(pf)
    pf.close()
    assert len(got) == 20
    for a, b in zip(got, imgs):
        assert np.array_equal(a, b.astype(np.float32))


def test_native_matches_python_loader(lib, tmp_path):
    from xivo_tpu.io.loader import _load_pnm
    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, (16, 20)).astype(np.uint8)
    p = str(tmp_path / "x.pgm")
    write_pgm(p, img)
    assert np.array_equal(native.load_pgm(p), _load_pnm(p))


def test_load_png_gray8(lib, tmp_path):
    from PIL import Image
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (37, 53), np.uint8)
    p = str(tmp_path / "g8.png")
    Image.fromarray(img, mode="L").save(p)
    out = native.load_image(p)
    assert out.shape == (37, 53)
    assert np.array_equal(out, img.astype(np.float32))


def test_load_png_gray16(lib, tmp_path):
    from PIL import Image
    rng = np.random.default_rng(1)
    img = rng.integers(0, 65536, (16, 24), np.uint16)
    p = str(tmp_path / "g16.png")
    Image.fromarray(img, mode="I;16").save(p)
    out = native.load_image(p)
    # 16-bit rescales to 0..255 (cv::IMREAD_GRAYSCALE contract); the
    # PIL fallback in io.loader applies the same 1/257 scale
    assert np.allclose(out, img.astype(np.float32) / 257.0, atol=1e-3)
    assert out.max() <= 255.0
    from xivo_tpu.io.loader import load_image as py_load

    import xivo_tpu.native as nat
    get_lib_save = nat.get_lib
    try:
        nat.get_lib = lambda: None  # force the PIL fallback path
        assert np.allclose(py_load(p), out, atol=1e-3)
    finally:
        nat.get_lib = get_lib_save


def test_load_png_rgb_luma(lib, tmp_path):
    from PIL import Image
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (20, 30, 3), np.uint8)
    p = str(tmp_path / "rgb.png")
    Image.fromarray(img, mode="RGB").save(p)
    out = native.load_image(p)
    luma = (0.299 * img[..., 0] + 0.587 * img[..., 1]
            + 0.114 * img[..., 2]).astype(np.float32)
    assert np.allclose(out, luma, atol=0.51)


def test_loader_prefers_native_png(lib, tmp_path):
    from PIL import Image
    from xivo_tpu.io.loader import load_image
    img = ((np.arange(64).reshape(8, 8) * 3) % 256).astype(np.uint8)
    p = str(tmp_path / "x.png")
    Image.fromarray(img, mode="L").save(p)
    out = load_image(p)
    assert np.array_equal(out, img.astype(np.float32))
