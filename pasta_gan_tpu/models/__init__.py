"""Model registry.

Replaces the reference's reflection-based `dnnlib.util.construct_class_by_name`
(`dnnlib/util.py:222-295`) with an explicit registry keyed by the reference
class names, so configs written against the reference resolve here too.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

from ..nn.discriminator import Discriminator
from .generator_full import GeneratorFull, cat_feats_dict
from .generator_v18 import GeneratorV18
from .generator_512 import Generator512, Generator512Plain
from .generator_v10 import GeneratorV10
from .generator_v11 import GeneratorV11, GeneratorV12
from .generator_v13 import GeneratorV13, GeneratorV14
from .generator_v1 import GeneratorV1, SynthesisNetworkV1
from .generator_v15 import GeneratorV15, GeneratorV15_2, GeneratorV17
from .generator_v21 import GeneratorV16, GeneratorV20, GeneratorV21
from .generator_stock import GeneratorStock
from .generator_ablations import (
    GeneratorAvgPatchFull,
    GeneratorNoCoarse,
    GeneratorNoCoarseNoMask,
    GeneratorPatch,
    GeneratorPatchDenorm,
    GeneratorPatchDenormCat,
    GeneratorPatchFull,
    GeneratorRaw,
    GeneratorRawFull,
)

MODEL_REGISTRY: Dict[str, Callable[..., Any]] = {
    # canonical names
    "GeneratorFull": GeneratorFull,
    "GeneratorV1": GeneratorV1,
    "GeneratorV18": GeneratorV18,
    "Generator512": Generator512,
    "Generator512Plain": Generator512Plain,
    "GeneratorV10": GeneratorV10,
    "GeneratorV11": GeneratorV11,
    "GeneratorV12": GeneratorV12,
    "GeneratorV13": GeneratorV13,
    "GeneratorV14": GeneratorV14,
    "GeneratorV15": GeneratorV15,
    "GeneratorV15_2": GeneratorV15_2,
    "GeneratorV17": GeneratorV17,
    "GeneratorV16": GeneratorV16,
    "GeneratorV20": GeneratorV20,
    "GeneratorV21": GeneratorV21,
    # stock StyleGAN2-ADA generator — the TF-legacy / transfer-learning
    # landing target (io/tf_legacy.py, reference legacy.py:109-204)
    "GeneratorStock": GeneratorStock,
    "Discriminator": Discriminator,
    # ablation clusters (networks.py:6235-7725)
    "GeneratorRaw": GeneratorRaw,
    "GeneratorPatch": GeneratorPatch,
    "GeneratorPatchDenorm": GeneratorPatchDenorm,
    "GeneratorPatchDenormCat": GeneratorPatchDenormCat,
    "GeneratorRawFull": GeneratorRawFull,
    "GeneratorPatchFull": GeneratorPatchFull,
    "GeneratorAvgPatchFull": GeneratorAvgPatchFull,
    "GeneratorNoCoarse": GeneratorNoCoarse,
    "GeneratorNoCoarseNoMask": GeneratorNoCoarseNoMask,
    "training.networks.GeneratorRaw": GeneratorRaw,
    "training.networks.GeneratorPatch": GeneratorPatch,
    "training.networks.GeneratorPatchDenorm": GeneratorPatchDenorm,
    "training.networks.GeneratorPatchDenormCat": GeneratorPatchDenormCat,
    "training.networks.GeneratorRawFull": GeneratorRawFull,
    "training.networks.GeneratorPatchFull": GeneratorPatchFull,
    "training.networks.GeneratorAvgPatchFull": GeneratorAvgPatchFull,
    "training.networks.GeneratorNoCoarse": GeneratorNoCoarse,
    "training.networks.GeneratorNoCoarseNoMask": GeneratorNoCoarseNoMask,
    # reference-style dotted names (training_options.json compatibility)
    "training.networks.GeneratorFull": GeneratorFull,
    "training.networks.Generator": GeneratorV1,
    "training.networks.GeneratorV18": GeneratorV18,
    "training.networks.GeneratorV10": GeneratorV10,
    "training.networks.GeneratorV11": GeneratorV11,
    "training.networks.GeneratorV12": GeneratorV12,
    "training.networks.GeneratorV13": GeneratorV13,
    "training.networks.GeneratorV14": GeneratorV14,
    # the reference's GeneratorV15 instantiates SynthesisNetworkV15_2
    # (3 spade blocks, networks.py:4704) — map it to our V15_2 build
    "training.networks.GeneratorV15": GeneratorV15_2,
    "training.networks.GeneratorV17": GeneratorV17,
    "training.networks.GeneratorV16": GeneratorV16,
    "training.networks.GeneratorV20": GeneratorV20,
    "training.networks.GeneratorV21": GeneratorV21,
    "training.networks.Generator_512": Generator512Plain,
    "training.networks.Generator_512_v2": Generator512Plain,
    "training.networks.Discriminator": Discriminator,
}


def register_model(name: str, ctor: Callable[..., Any]) -> None:
    MODEL_REGISTRY[name] = ctor


def build_model(class_name: str, **kwargs):
    if class_name not in MODEL_REGISTRY:
        raise KeyError(
            f"unknown model {class_name!r}; known: {sorted(MODEL_REGISTRY)}"
        )
    return MODEL_REGISTRY[class_name](**kwargs)


__all__ = [
    "GeneratorFull",
    "GeneratorV1",
    "GeneratorV18",
    "Generator512",
    "Generator512Plain",
    "Discriminator",
    "MODEL_REGISTRY",
    "register_model",
    "build_model",
    "cat_feats_dict",
]
