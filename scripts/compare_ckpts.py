"""Compare checkpoints on the flat-content quality gate (model selection
for shipping)."""
import sys
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/yondx_xla_cache")
import importlib.util
spec = importlib.util.spec_from_file_location(
    "ev", __file__.replace("compare_ckpts", "eval_synth"))
ev = importlib.util.module_from_spec(spec); spec.loader.exec_module(ev)
from yondx.models import build_model
from yondx.models.registry import init_params
from yondx.pipeline import VSTDenoiser, YONDEngine, PipelineConfig
from yondx.train.ckpt import load_checkpoint
from yondx.vst.lut import BiasLUT
from yondx.eval import psnr

arch = {"name": "GuidedResUnet", "guided": True, "in_nc": 4, "out_nc": 4,
        "nf": 32, "nframes": 1, "res": True, "norm": True}
model = build_model(arch)
lut = BiasLUT()
scenes = [ev.make_scene(i, content="flat") for i in range(8)]

for path in sys.argv[1:]:
    params = init_params(model, jax.random.PRNGKey(0), (1, 128, 128, 4))
    params = load_checkpoint(path, params)["params"]
    den = VSTDenoiser(model, params, guided=True, bias_corr="pre")
    eng = YONDEngine(den, PipelineConfig(est_type="simple", max_iter=1),
                     biaslut=lut)
    vals = []
    for clean, noisy, K, sigma in scenes:
        p = {"wp": 1023, "bl": 64, "ratio": 1, "scale": 959.0,
             "gain": 1.0, "sigma": 0.0}
        res = eng.iter_denoise({"lr": noisy}, p)
        vals.append(float(psnr(res["raw_dns"][-1], clean)))
    noisy_p = np.mean([float(psnr(n, c)) for c, n, _, _ in scenes])
    print(f"{path}: mean {np.mean(vals):.2f} (noisy {noisy_p:.2f}) "
          f"per-scene {[round(v,1) for v in vals]}")
