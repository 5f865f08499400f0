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
    tvf = _stub("torchvision.transforms.functional")
    tvt = _stub("torchvision.transforms")
    tvt.functional = tvf
    tv = _stub("torchvision")
    tv.ops = ops
    tv.transforms = tvt
    _stub("MultiScaleDeformableAttention")


def load_ref(name, path):
    """Load a single reference file under ``name`` after installing stubs."""
    import importlib.util

    install_ref_stubs()
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def preload(full_name, path):
    """Load a reference file under its dotted name, seeding synthetic parent
    packages so `from models.x.y import Z` resolves WITHOUT executing the
    real package __init__ (which drags in timm-dependent files)."""
    import importlib.util

    install_ref_stubs()
    parts = full_name.split(".")
    # top-level 'models' is a NAMESPACE package (no __init__) — let Python
    # import it for real; seed only the deeper parents whose real __init__
    # would drag in unavailable deps
    for i in range(2, len(parts)):
        pkg = ".".join(parts[:i])
        if pkg not in sys.modules:
            m = types.ModuleType(pkg)
            m.__path__ = []
            sys.modules[pkg] = m
    if full_name in sys.modules:
        return sys.modules[full_name]
    spec = importlib.util.spec_from_file_location(full_name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[full_name] = mod
    spec.loader.exec_module(mod)
    setattr(sys.modules[".".join(parts[:-1])], parts[-1], mod)
    return mod
