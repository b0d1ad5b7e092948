"""Import helper for the reference PyTorch implementation at /root/reference.

The reference imports torchvision (and prettytable) at module scope but the
test environment has neither; they are only used by data/VGG-stem paths we
don't exercise, so stub them before importing reference modules.
"""

import sys
import types


def _stub(name, **attrs):
    if name in sys.modules:
        return sys.modules[name]
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def enable_reference_imports():
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")

    if "torchvision" not in sys.modules:
        tv = _stub("torchvision")
        tv.__path__ = []  # mark as package so submodule imports resolve
        transforms = _stub("torchvision.transforms")

        class _Passthrough:
            def __init__(self, *a, **k):
                pass

            def __call__(self, x):
                return x

        for cls in ("Compose", "ToTensor", "Normalize", "Resize",
                    "CenterCrop", "RandomResizedCrop", "RandomHorizontalFlip",
                    "ColorJitter", "Pad", "RandomCrop", "Grayscale",
                    "RandomRotation", "RandomAffine"):
            setattr(transforms, cls, _Passthrough)
        tv.transforms = transforms
        tv.datasets = _stub("torchvision.datasets")
        tv.models = _stub("torchvision.models")
        tv.utils = _stub("torchvision.utils")

        # the VGG-stem models (TT_FHE_XSMALL_vAlexnet.py:594,
        # TT_general_imagenet_v2_xsmall_alexnet.py:164) pull
        # vgg16(pretrained=True).features[0..3] — in this zero-egress
        # environment return randomly-initialized REAL layers with the
        # VGG16 head layout so the classes instantiate and parity runs
        def _vgg16(pretrained=False, **_k):
            import torch.nn as nn

            return types.SimpleNamespace(features=nn.Sequential(
                nn.Conv2d(3, 64, 3, padding=1), nn.ReLU(inplace=True),
                nn.Conv2d(64, 64, 3, padding=1), nn.ReLU(inplace=True),
                nn.MaxPool2d(2)))

        def _densenet121(pretrained=False, **_k):
            import torch.nn as nn

            # instantiated-then-discarded (TT_FHE_XSMALL_vAlexnet.py:597)
            return types.SimpleNamespace(features=nn.Sequential(
                nn.Conv2d(3, 64, 7, stride=2, padding=3)))

        tv.models.vgg16 = _vgg16
        tv.models.densenet121 = _densenet121

    if "prettytable" not in sys.modules:
        class _PT:
            def __init__(self, *a, **k):
                pass

            def add_row(self, *a):
                pass

            def __str__(self):
                return "<PrettyTable stub>"

        _stub("prettytable", PrettyTable=_PT)
