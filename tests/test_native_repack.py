"""Native C++ repacker must be bit-identical to the numpy path."""

import numpy as np
import pytest

from llama_gguf_inference_tpu.gguf.constants import GGMLType
from llama_gguf_inference_tpu.native import load_library, native_repack
from llama_gguf_inference_tpu.quant import quantize

pytestmark = pytest.mark.skipif(load_library() is None,
                                reason="native toolchain unavailable")

FORMATS = [GGMLType.Q8_0, GGMLType.Q4_K, GGMLType.Q6_K]


def _numpy_repack(raw, gtype, out_f, in_f):
    """Force the numpy path regardless of native availability."""
    import os
    from llama_gguf_inference_tpu.quant import repack as rp
    import llama_gguf_inference_tpu.native as native

    class _Off:
        def __enter__(self):
            os.environ["LGT_NO_NATIVE"] = "1"
            self._lib, self._failed = native._LIB, native._LIB_FAILED
            native._LIB, native._LIB_FAILED = None, True

        def __exit__(self, *a):
            os.environ.pop("LGT_NO_NATIVE", None)
            native._LIB, native._LIB_FAILED = self._lib, self._failed

    with _Off():
        return rp.repack(raw, gtype, out_f, in_f)


@pytest.mark.parametrize("gtype", FORMATS, ids=lambda t: t.name)
@pytest.mark.parametrize("shape", [(4, 512), (3, 1024), (128, 256)])
def test_native_matches_numpy(gtype, shape, rng):
    out_f, in_f = shape
    x = rng.normal(size=(out_f, in_f)).astype(np.float32)
    raw = np.frombuffer(quantize(x, gtype), dtype=np.uint8)

    want = _numpy_repack(raw, gtype, out_f, in_f)
    got = native_repack(raw, gtype.name.lower(), out_f, in_f)
    assert got is not None

    np.testing.assert_array_equal(got.codes, want.codes)
    np.testing.assert_array_equal(got.d, want.d)
    if want.sc is not None:
        np.testing.assert_array_equal(got.sc, want.sc)
    if want.dmin is not None:
        np.testing.assert_array_equal(got.dmin, want.dmin)
    if want.mn is not None:
        np.testing.assert_array_equal(got.mn, want.mn)
    assert (got.fmt, got.bits, got.sub_size, got.d_size, got.code_bias) == \
        (want.fmt, want.bits, want.sub_size, want.d_size, want.code_bias)
