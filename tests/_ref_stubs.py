"""Shared sys.modules stubs that let single reference files load without the
CUDA/fvcore/torchvision packages this environment lacks. Used by the
cross-framework parity tests."""

import sys
import types


class _AnyAttr(types.ModuleType):
    def __getattr__(self, name):
        if name.startswith("__"):
            raise AttributeError(name)
        return lambda *a, **k: None


def _stub(name):
    m = _AnyAttr(name)
    sys.modules[name] = m
    return m


def install_ref_stubs():
    """fvcore / torchvision / the CUDA MSDA module, as inert stand-ins."""
    import torch.nn as tnn

    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    wi = _stub("fvcore.nn.weight_init")
    fvnn = _stub("fvcore.nn")
    fvnn.weight_init = wi
    _stub("fvcore").nn = fvnn
    ops = _stub("torchvision.ops")
    ops.MultiScaleRoIAlign = object
    misc = _stub("torchvision.ops.misc")
    misc.FrozenBatchNorm2d = tnn.BatchNorm2d
    _stub("torchvision.ops.boxes")
    _stub("torchvision").ops = ops
    _stub("MultiScaleDeformableAttention")


def load_ref(name, path):
    """Load a single reference file under ``name`` after installing stubs."""
    import importlib.util

    install_ref_stubs()
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod
