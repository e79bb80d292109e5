"""Import helper: load the reference PyTorch arch modules for parity tests.

The reference (/root/reference, read-only) depends on timm/torchvision/pyiqa
which are not installed. This shim fabricates lightweight stand-ins for the
few symbols the *arch* modules touch at import time and exposes the reference
modules via synthetic `basicsr.*` packages whose __path__ points into
/root/reference — so `basicsr/__init__.py` (which needs pyiqa) is never run.

Used only by tests to produce golden outputs; no reference code is copied.
"""

import importlib
import sys
import types

REF_ROOT = '/root/reference/basicsr'


def _install_timm_stub():
    if 'timm.models.layers' in sys.modules:
        return
    import torch

    timm = types.ModuleType('timm')
    models = types.ModuleType('timm.models')
    layers = types.ModuleType('timm.models.layers')

    def to_2tuple(x):
        return x if isinstance(x, tuple) else (x, x)

    def trunc_normal_(tensor, mean=0., std=1., a=-2., b=2.):
        return torch.nn.init.trunc_normal_(tensor, mean=mean, std=std, a=a, b=b)

    class DropPath(torch.nn.Module):
        def __init__(self, drop_prob=None):
            super().__init__()
            self.drop_prob = drop_prob or 0.0

        def forward(self, x):
            assert self.drop_prob == 0.0, 'stub DropPath supports rate 0 only'
            return x

    layers.to_2tuple = to_2tuple
    layers.trunc_normal_ = trunc_normal_
    layers.DropPath = DropPath
    models.layers = layers
    timm.models = models
    sys.modules['timm'] = timm
    sys.modules['timm.models'] = models
    sys.modules['timm.models.layers'] = layers


def _install_torchvision_stub():
    if 'torchvision' in sys.modules:
        return
    tv = types.ModuleType('torchvision')
    tv_models = types.ModuleType('torchvision.models')
    vgg = types.ModuleType('torchvision.models.vgg')

    def _unavailable(*a, **k):
        raise RuntimeError('torchvision VGG weights unavailable in this env')

    for name in ['vgg11', 'vgg13', 'vgg16', 'vgg19', 'vgg11_bn', 'vgg13_bn',
                 'vgg16_bn', 'vgg19_bn']:
        setattr(vgg, name, _unavailable)
    tv_models.vgg = vgg
    tv.models = tv_models
    sys.modules['torchvision'] = tv
    sys.modules['torchvision.models'] = tv_models
    sys.modules['torchvision.models.vgg'] = vgg


def _install_pyiqa_stub():
    if 'pyiqa' in sys.modules:
        return
    pyiqa = types.ModuleType('pyiqa')

    def create_metric(*a, **k):
        raise RuntimeError('pyiqa unavailable in this env (stub)')

    pyiqa.create_metric = create_metric
    sys.modules['pyiqa'] = pyiqa


def _install_fake_pkg(name: str, path: str):
    if name in sys.modules:
        return
    pkg = types.ModuleType(name)
    pkg.__path__ = [path]
    sys.modules[name] = pkg


def load_reference_module(modname: str):
    """Import e.g. 'basicsr.archs.femasr_arch' from /root/reference."""
    _install_timm_stub()
    _install_torchvision_stub()
    _install_pyiqa_stub()
    _install_fake_pkg('basicsr', REF_ROOT)
    _install_fake_pkg('basicsr.utils', REF_ROOT + '/utils')
    _install_fake_pkg('basicsr.archs', REF_ROOT + '/archs')
    _install_fake_pkg('basicsr.data', REF_ROOT + '/data')
    _install_fake_pkg('basicsr.losses', REF_ROOT + '/losses')
    _install_fake_pkg('basicsr.models', REF_ROOT + '/models')
    return importlib.import_module(modname)
