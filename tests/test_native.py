"""Native C++ decoder: build, parity with the numpy transform path,
pipeline integration."""

import numpy as np
import pytest

from clibd_tpu.data.native import load_native_decoder
from clibd_tpu.data.transforms import eval_transform


@pytest.fixture(scope="module")
def decoder():
    dec = load_native_decoder(build_if_missing=True)
    if dec is None:
        pytest.skip("native decoder could not be built")
    return dec


def test_eval_parity_with_numpy_path(decoder, rng):
    from tests.fixtures import random_jpeg_bytes

    jpegs = [
        random_jpeg_bytes(rng, h=90, w=130),
        random_jpeg_bytes(rng, h=260, w=300),
        random_jpeg_bytes(rng, h=64, w=64),
    ]
    out = decoder.decode_transform_batch(jpegs, train=False)
    ref = np.stack([eval_transform(j) for j in jpegs])
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_eval_noninteger_aspect_ratio_parity(decoder, rng):
    """Non-integer aspect ratios where truncation != rounding (torchvision
    _compute_resized_output_size truncates the scaled long edge: 300×451 at
    256 → 384, not 385).  Native and numpy paths must agree exactly."""
    from tests.fixtures import random_jpeg_bytes

    from clibd_tpu.data.transforms import decode_jpeg, resize_shorter_edge

    jpegs = [random_jpeg_bytes(rng, h=300, w=451), random_jpeg_bytes(rng, h=451, w=300)]
    img = decode_jpeg(jpegs[0]).astype(np.float32) / 255.0
    assert resize_shorter_edge(img, 256).shape == (256, 384, 3)  # int(256*451/300)
    out = decoder.decode_transform_batch(jpegs, train=False)
    ref = np.stack([eval_transform(j) for j in jpegs])
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_eval_pad_case_parity(decoder, rng):
    """resize_to < out_size: the eval crop must zero-pad like the numpy path
    (regression: the native crop used to memcpy past the resized buffer)."""
    from tests.fixtures import random_jpeg_bytes

    jpegs = [random_jpeg_bytes(rng, h=300, w=200), random_jpeg_bytes(rng, h=180, w=400)]
    out = decoder.decode_transform_batch(jpegs, train=False, size=320, resize_to=256)
    ref = np.stack([eval_transform(j, 320, 256) for j in jpegs])
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_train_mode_deterministic_per_seed(decoder, rng):
    from tests.fixtures import random_jpeg_bytes

    jpegs = [random_jpeg_bytes(rng, h=100, w=140)]
    a = decoder.decode_transform_batch(jpegs, rng=np.random.default_rng(5), train=True)
    b = decoder.decode_transform_batch(jpegs, rng=np.random.default_rng(5), train=True)
    c = decoder.decode_transform_batch(jpegs, rng=np.random.default_rng(6), train=True)
    np.testing.assert_array_equal(a, b)
    assert np.abs(a - c).max() > 0  # different seed -> different crop
    assert a.shape == (1, 224, 224, 3)
    assert 0.0 <= a.min() and a.max() <= 1.0


def test_invalid_jpeg_raises(decoder):
    with pytest.raises(ValueError, match="native decode failed"):
        decoder.decode_transform_batch([b"not a jpeg"], train=False)


def test_pipeline_with_native_decoder(decoder, tiny_hdf5):
    from clibd_tpu.data.pipeline import BatchSpec, BioscanLoader

    spec = BatchSpec(batch_size=4, train=False)
    l_native = BioscanLoader(tiny_hdf5, "all_keys", spec, num_workers=0, decoder=decoder)
    l_py = BioscanLoader(tiny_hdf5, "all_keys", spec, num_workers=0)
    b_native = next(iter(l_native.batches()))
    b_py = next(iter(l_py.batches()))
    np.testing.assert_allclose(b_native["image"], b_py["image"], atol=1e-5)
    l_native.close(); l_py.close()


def test_native_two_view(tmp_path):
    """C++ two-view: decode once, two independent crops per image; the views
    differ from each other but share the underlying decode (same image)."""
    import numpy as np

    from clibd_tpu.data.native import load_native_decoder
    from tests.fixtures import random_jpeg_bytes

    dec = load_native_decoder(build_if_missing=True)
    if dec is None:
        import pytest

        pytest.skip("native decoder unavailable")
    rng = np.random.default_rng(0)
    jpegs = [random_jpeg_bytes(rng, 96, 120) for _ in range(5)]
    r1 = np.random.default_rng(1)
    r2 = np.random.default_rng(2)
    v1, v2 = dec.decode_transform_two_view(jpegs, r1, r2, size=64, resize_to=72)
    assert v1.shape == v2.shape == (5, 64, 64, 3)
    assert np.abs(v1 - v2).max() > 0  # independent crops
    assert 0.0 <= v1.min() and v1.max() <= 1.0
    # same seeds -> identical views (deterministic crop streams)
    v1b, v2b = dec.decode_transform_two_view(
        jpegs, np.random.default_rng(1), np.random.default_rng(2), size=64, resize_to=72)
    np.testing.assert_array_equal(v1, v1b)
    np.testing.assert_array_equal(v2, v2b)


def test_two_view_loader_native(tiny_hdf5):
    """TwoViewLoader with the native decoder yields paired two-crop batches."""
    import numpy as np

    from clibd_tpu.data.native import load_native_decoder
    from clibd_tpu.engine.simclr import TwoViewLoader

    if load_native_decoder(build_if_missing=True) is None:
        import pytest

        pytest.skip("native decoder unavailable")
    loader = TwoViewLoader(tiny_hdf5, "all_keys", batch_size=4, num_workers=0,
                           seed=5, use_native=True)
    v1, v2, idx = next(loader.batches(epoch=0))
    assert v1.shape == v2.shape == (4, 224, 224, 3)
    assert np.abs(v1 - v2).max() > 0
    loader.close()


def _smooth_jpeg(h: int, w: int) -> bytes:
    """Natural-image-like smooth gradient (random-noise JPEGs would measure
    the filters' response to content JPEG itself cannot represent)."""
    import io

    from PIL import Image

    y, x = np.mgrid[0:h, 0:w].astype(np.float32)
    r = 127 + 100 * np.sin(x / 37.0) * np.cos(y / 23.0)
    g = 127 + 100 * np.cos(x / 29.0 + 1.0)
    b = 127 + 100 * np.sin((x + y) / 51.0)
    arr = np.clip(np.stack([r, g, b], -1), 0, 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG", quality=90)
    return buf.getvalue()


def test_eval_crop_fastpath_exact_at_production_geometry(decoder, rng):
    """256px-shorter-edge sources (the BIOSCAN HDF5 production case) take the
    eval crop fast path: decode-and-discard rows above the crop window, stop
    at its last row (jpeg_abort_decompress), convert only the window to float.
    libjpeg's jpeg_crop_scanline/jpeg_skip_scanlines are deliberately NOT used
    (measured non-bit-exact on 4:2:0 — they change the chroma-upsampling
    context; native/decoder.cpp).  The identity resize makes this bit-exact
    vs the full decode+resize+crop path."""
    from tests.fixtures import random_jpeg_bytes

    jpegs = [
        random_jpeg_bytes(rng, h=256, w=256),
        random_jpeg_bytes(rng, h=256, w=341),  # non-square, odd crop offset
        random_jpeg_bytes(rng, h=300, w=256),
    ]
    out = decoder.decode_transform_batch(jpegs, train=False)
    ref = np.stack([eval_transform(j) for j in jpegs])
    # 1 float ULP: the native path computes u8*(1/255.f), numpy divides
    np.testing.assert_allclose(out, ref, atol=6e-8)


def test_dct_scaled_decode_within_transform_tolerance(decoder):
    """DCT-scaled decode (train default) vs full-resolution decode on an
    oversized smooth source: same shape, small filter difference (the IDCT
    box prefilter vs pure antialiased resize), well below augmentation and
    bf16 compute noise."""
    jpegs = [_smooth_jpeg(600, 800), _smooth_jpeg(520, 512)]
    full = decoder.decode_transform_batch(jpegs, train=False, dct_scale=False)
    scaled = decoder.decode_transform_batch(jpegs, train=False, dct_scale=True)
    assert scaled.shape == full.shape
    diff = np.abs(scaled - full)
    assert diff.max() > 0, "scaling should have engaged for 600px+ sources"
    assert diff.mean() < 5e-3, f"mean abs diff {diff.mean():.4f}"
    assert np.percentile(diff, 99.9) < 0.06, f"p99.9 {np.percentile(diff, 99.9):.4f}"


def test_dct_scale_never_engages_at_production_sizes(decoder, rng):
    """resize_to == source shorter edge → no m/8 reduction exists, so train
    decode is IDENTICAL with scaling on or off (the production HDF5 case)."""
    from tests.fixtures import random_jpeg_bytes

    jpegs = [random_jpeg_bytes(rng, h=256, w=256)]
    seeds = np.random.default_rng(3)
    a = decoder.decode_transform_batch(jpegs, rng=np.random.default_rng(3), train=True, dct_scale=True)
    b = decoder.decode_transform_batch(jpegs, rng=np.random.default_rng(3), train=True, dct_scale=False)
    np.testing.assert_array_equal(a, b)
