"""File-based estimator dispatch + SIDD submission writer + config extras."""
import os
import pickle

import numpy as np

from yondx.pipeline import PipelineConfig


def test_pipeline_config_extras():
    cfg = PipelineConfig.from_dict({
        "est_type": "simple", "bias_corr": "none", "cal_est": "/tmp/x.pkl",
        "custom_key": 7})
    assert cfg.bias_corr is None
    assert cfg.cal_est == "/tmp/x.pkl"
    assert cfg.extras["custom_key"] == 7


def _engine(pipe):
    from yondx.pipeline import VSTDenoiser, YONDEngine
    from yondx.nle import box_mean

    class _Blur:
        def apply(self, p, x, t=None):
            return box_mean(x, 5)

    den = VSTDenoiser(_Blur(), None, guided=False, bias_corr=None,
                      vst_type="asym")
    return YONDEngine(den, pipe)


def test_cal_est_dispatch(tmp_path):
    record = {"sfrn": {"IP_00800": (3e-3, 5e-5)},
              "beta1": {"GP": np.array([1e-6, 1e-4])},
              "beta2": {"GP": np.array([1e-9, 1e-7])}}
    path = str(tmp_path / "cal.pkl")
    with open(path, "wb") as f:
        pickle.dump(record, f)
    pipe = PipelineConfig(est_type="cal_est", cal_est=path, iter="once")
    eng = _engine(pipe)
    noisy = np.random.rand(2, 128, 128).astype(np.float32)
    # direct-hit key
    res = eng.iter_denoise(
        {"lr": noisy, "name": "0001_001_IP_00800_x_y_z"},
        {"wp": 1023, "bl": 64, "ratio": 1, "scale": 959.0,
         "gain": 1.0, "sigma": 0.0})
    np.testing.assert_allclose(res["regs"][0], (3e-3, 5e-5))
    # polynomial fallback
    res2 = eng.iter_denoise(
        {"lr": noisy, "name": "0001_001_GP_00100_x_y_z"},
        {"wp": 1023, "bl": 64, "ratio": 1, "scale": 959.0,
         "gain": 1.0, "sigma": 0.0})
    b1 = np.polyval([1e-6, 1e-4], 100)
    np.testing.assert_allclose(res2["regs"][0][0], b1, rtol=1e-6)


def test_zou_npy_dispatch(tmp_path):
    base = tmp_path / "SIDD_Validation_Raw"
    base.mkdir()
    np.save(base / "Zou_fullPict.npy",
            np.array([[2e-3, 4e-5], [1e-3, 2e-5]], np.float32))
    pipe = PipelineConfig(est_type="zou", iter="once")
    eng = _engine(pipe)
    noisy = np.random.rand(2, 128, 128).astype(np.float32)
    res = eng.iter_denoise(
        {"lr": noisy, "name": "s", "root_dir": str(tmp_path)},
        {"wp": 1023, "bl": 64, "ratio": 1, "scale": 959.0,
         "gain": 1.0, "sigma": 0.0}, img_id=1)
    np.testing.assert_allclose(res["regs"][0], (1e-3, 2e-5), rtol=1e-6)


def test_submission_writer(tmp_path):
    from yondx.eval.sidd import SIDDEvalHarness
    h = SIDDEvalHarness(None, [], "subm_test")
    results = np.random.rand(2, 32, 16, 16).astype(np.float32)
    out = h.write_submission(results, out_dir=str(tmp_path))
    assert os.path.exists(out)
    import scipy.io as sio
    back = sio.loadmat(out)["results"]
    np.testing.assert_allclose(back, results, atol=1e-6)
