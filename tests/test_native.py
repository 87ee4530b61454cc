"""Native C++ kernel tests (skipped when no compiler is available)."""

import json

import numpy as np
import pytest

from nemo_tpu.ops import get_native

pytestmark = pytest.mark.skipif(get_native() is None,
                                reason="native library unavailable")


class TestNativeChamfer:
    def test_matches_brute_force(self, rng):
        from nemo_tpu.ops import chamfer_forward_native
        a = rng.randn(60, 3).astype(np.float32)
        b = rng.randn(90, 3).astype(np.float32)
        d, i = chamfer_forward_native(a, b)
        bd = ((a[:, None] - b[None]) ** 2).sum(-1)
        np.testing.assert_allclose(d, bd.min(1), atol=1e-5)
        np.testing.assert_array_equal(i, bd.argmin(1))

    def test_matches_jax_op(self, rng):
        import jax.numpy as jnp
        from nemo_tpu.ops import chamfer_forward_native, nn_one_way
        a = rng.randn(40, 3).astype(np.float32)
        b = rng.randn(30, 3).astype(np.float32)
        d_n, i_n = chamfer_forward_native(a, b)
        d_j, i_j = nn_one_way(jnp.asarray(a), jnp.asarray(b))
        np.testing.assert_allclose(d_n, np.asarray(d_j), atol=1e-4)
        np.testing.assert_array_equal(i_n, np.asarray(i_j))


class TestNativeJSON:
    def test_parses_and_matches_python(self, tmp_path, rng):
        from nemo_tpu.data.openpose import load_openpose_dir
        kps = rng.rand(3, 25, 3).astype(np.float32) * 100
        for i in range(3):
            rec = ({"people": []} if i == 1 else
                   {"people": [{"pose_keypoints_2d": kps[i].ravel().tolist()}]})
            with open(tmp_path / f"{i:06d}_keypoints.json", "w") as f:
                json.dump(rec, f)
        native = load_openpose_dir(str(tmp_path), use_native=True)
        python = load_openpose_dir(str(tmp_path), use_native=False)
        np.testing.assert_allclose(native, python, atol=1e-3)
        np.testing.assert_allclose(native[1], 0.0)
