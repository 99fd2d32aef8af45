"""Orbax checkpoint backend roundtrip."""
import numpy as np
import jax.numpy as jnp


def test_orbax_roundtrip(tmp_path):
    from yondx.train import orbax_ckpt
    params = {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.ones(3)}
    p = str(tmp_path / "ck")
    orbax_ckpt.save(p, params, epoch=3, best_psnr=30.0)
    out = orbax_ckpt.load(p)
    np.testing.assert_array_equal(np.asarray(out["params"]["w"]),
                                  np.asarray(params["w"]))
    assert out["meta"]["epoch"] == 3
