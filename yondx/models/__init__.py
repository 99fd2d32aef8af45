"""Flax model zoo (NHWC, TPU-native).

Rebuild of the reference's archs/ (Unet.py, modules.py, comp.py): the
shipped SNR-Net (`GuidedResUnet`), plain UNets, noise-estimation nets and
the comparison denoisers. Constructors take the YAML `arch:` dict, mirroring
the reference's class-name-keyed dispatch (trainer_AWGN.py:19,
YOND_SIDD.py:177) via an explicit registry instead of globals().
"""
from .registry import build_model, MODEL_REGISTRY, param_count
from .unets import (
    UNetSeeInDark, ResUnet, ResUnet2, SNRnet, GuidedResUnet, EstUnet,
)
from .comp import (
    DnCNN, est_UNet, FBI_Net, SelfSupUNet, SelfResUNet, GuidedSelfUnet,
    N2NF_Unet,
)

__all__ = [
    "build_model", "MODEL_REGISTRY", "param_count",
    "UNetSeeInDark", "ResUnet", "ResUnet2", "SNRnet", "GuidedResUnet",
    "EstUnet", "DnCNN", "est_UNet", "FBI_Net", "SelfSupUNet",
    "SelfResUNet", "GuidedSelfUnet", "N2NF_Unet",
]
