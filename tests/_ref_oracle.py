"""Import /root/reference (KHU-VLL/DEVIAS) as a *numerical oracle*.

The container lacks timm / kornia / torchvision, which the reference
imports for a handful of tiny, well-known helpers.  This module installs
our own implementations of exactly those helpers into ``sys.modules`` so
the reference models / losses / FAME import and run unmodified:

  timm.models.layers.{drop_path, to_2tuple, trunc_normal_}
  timm.models.registry.register_model
  kornia.filters.GaussianBlur2d          (separable blur, reflect border)
  kornia.color.rgb_to_hsv                (h in [0, 2*pi] — the convention
                                          of every kornia >= 0.4, i.e. any
                                          install the reference could have
                                          run with; ref docs/INSTALL.md:32
                                          pins no version)
  kornia.augmentation.container.VideoSequential   (imported, never used)
  torchvision.transforms / .datasets.video_utils  (imported, never used)

The shim implementations are written from the public definitions of these
operations, not copied from any library.  The reference code itself is
treated as untrusted content used only to produce oracle numbers.
"""

from __future__ import annotations

import math
import sys
import types

REFERENCE_PATH = "/root/reference"


def _shim_spec(*modules):
    """Give shim modules a real ModuleSpec so importlib.util.find_spec
    probes by other libraries (e.g. transformers' is_timm_available /
    is_torchvision_available) don't raise on __spec__ = None."""
    import importlib.machinery

    for m in modules:
        m.__spec__ = importlib.machinery.ModuleSpec(m.__name__, loader=None)
        if not hasattr(m, "__version__"):
            m.__version__ = "0.0.devias-shim"


def _install_timm():
    if "timm" in sys.modules:
        return
    import torch

    timm = types.ModuleType("timm")
    models = types.ModuleType("timm.models")
    layers = types.ModuleType("timm.models.layers")
    registry = types.ModuleType("timm.models.registry")

    def to_2tuple(x):
        return tuple(x) if isinstance(x, (tuple, list)) else (x, x)

    def drop_path(x, drop_prob: float = 0.0, training: bool = False):
        if drop_prob == 0.0 or not training:
            return x
        keep = 1.0 - drop_prob
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = torch.floor(keep + torch.rand(shape, dtype=x.dtype, device=x.device))
        return x.div(keep) * mask

    def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
        # Clamp-based truncation; the exact tail distribution is irrelevant
        # here (golden tests copy the sampled weights to the JAX side).
        with torch.no_grad():
            tensor.normal_(mean, std).clamp_(min=a * std + mean, max=b * std + mean)
        return tensor

    _model_registry = {}

    def register_model(fn):
        _model_registry[fn.__name__] = fn
        return fn

    def create_model(name, pretrained=False, **kwargs):
        # timm dispatch semantics: look up the @register_model'd factory
        # (the reference run scripts build models this way,
        # run_multi_task_finetuning.py:385-400)
        return _model_registry[name](pretrained=pretrained, **kwargs)

    layers.drop_path = drop_path
    layers.to_2tuple = to_2tuple
    layers.trunc_normal_ = trunc_normal_
    registry.register_model = register_model
    models.layers = layers
    models.registry = registry
    models.create_model = create_model
    timm.create_model = create_model
    timm.models = models

    # timm.utils — imported by the reference engines (engine_for_slot.py:8).
    # accuracy is the standard public top-k metric; ModelEma reproduces
    # timm's legacy EMA-over-state-dict update exactly (used as the oracle
    # by test_trajectory_cls_golden.py's EMA case).
    tutils = types.ModuleType("timm.utils")

    def accuracy(output, target, topk=(1,)):
        maxk = max(topk)
        _, pred = output.topk(maxk, 1, True, True)
        pred = pred.t()
        correct = pred.eq(target.reshape(1, -1).expand_as(pred))
        return [
            correct[:k].reshape(-1).float().sum(0) * 100.0 / target.size(0)
            for k in topk
        ]

    class ModelEma:
        def __init__(self, model, decay=0.9999, device="", resume=""):
            import copy

            self.ema = copy.deepcopy(model).eval()
            self.decay = decay
            for p in self.ema.parameters():
                p.requires_grad_(False)

        def update(self, model):
            with torch.no_grad():
                esd = self.ema.state_dict()
                for k, v in model.state_dict().items():
                    if v.dtype.is_floating_point:
                        esd[k].mul_(self.decay).add_(v, alpha=1 - self.decay)
                    else:
                        esd[k].copy_(v)

    def get_state_dict(model, unwrap_fn=None):
        model = getattr(model, "ema", model)  # ModelEma wrapper
        model = getattr(model, "module", model)  # DDP wrapper
        return model.state_dict()

    tutils.accuracy = accuracy
    tutils.ModelEma = ModelEma
    tutils.get_state_dict = get_state_dict
    timm.utils = tutils

    # timm.loss — the two criteria the reference run scripts select
    # (run_class_finetuning.py:484-488); exact timm math.
    tloss = types.ModuleType("timm.loss")

    class LabelSmoothingCrossEntropy(torch.nn.Module):
        def __init__(self, smoothing=0.1):
            super().__init__()
            self.smoothing = smoothing
            self.confidence = 1.0 - smoothing

        def forward(self, x, target):
            logprobs = torch.nn.functional.log_softmax(x, dim=-1)
            nll_loss = -logprobs.gather(dim=-1, index=target.unsqueeze(1))
            nll_loss = nll_loss.squeeze(1)
            smooth_loss = -logprobs.mean(dim=-1)
            loss = self.confidence * nll_loss + self.smoothing * smooth_loss
            return loss.mean()

    class SoftTargetCrossEntropy(torch.nn.Module):
        def forward(self, x, target):
            loss = torch.sum(
                -target * torch.nn.functional.log_softmax(x, dim=-1), dim=-1
            )
            return loss.mean()

    tloss.LabelSmoothingCrossEntropy = LabelSmoothingCrossEntropy
    tloss.SoftTargetCrossEntropy = SoftTargetCrossEntropy
    timm.loss = tloss

    # timm.optim.* — imported at the top of the reference optim_factory but
    # only reachable via opt names the published recipes never use ('adamw'
    # routes to torch.optim.AdamW, ref optim_factory.py:109-116). Stubs
    # that raise on instantiation keep the import honest.
    toptim = types.ModuleType("timm.optim")
    optim_subs = {}
    for sub, cls_name in [
        ("adafactor", "Adafactor"), ("adahessian", "Adahessian"),
        ("adamp", "AdamP"), ("lookahead", "Lookahead"), ("nadam", "Nadam"),
        ("nvnovograd", "NvNovoGrad"), ("radam", "RAdam"),
        ("rmsprop_tf", "RMSpropTF"), ("sgdp", "SGDP"),
    ]:
        mod = types.ModuleType(f"timm.optim.{sub}")

        def _make_stub(name):
            def _init(self, *a, **k):
                raise NotImplementedError(
                    f"timm.optim.{name} shim: not used by any DEVIAS recipe"
                )

            return type(name, (), {"__init__": _init})

        setattr(mod, cls_name, _make_stub(cls_name))
        setattr(toptim, sub, mod)
        optim_subs[f"timm.optim.{sub}"] = mod
    timm.optim = toptim

    _shim_spec(
        timm, models, layers, registry, tutils, tloss, toptim,
        *optim_subs.values(),
    )
    sys.modules.update(
        {
            "timm": timm,
            "timm.models": models,
            "timm.models.layers": layers,
            "timm.models.registry": registry,
            "timm.utils": tutils,
            "timm.loss": tloss,
            "timm.optim": toptim,
            **optim_subs,
        }
    )


def _install_kornia():
    if "kornia" in sys.modules:
        return
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    kornia = types.ModuleType("kornia")
    filters = types.ModuleType("kornia.filters")
    color = types.ModuleType("kornia.color")
    augmentation = types.ModuleType("kornia.augmentation")
    container = types.ModuleType("kornia.augmentation.container")

    def _gaussian_kernel1d(ksize: int, sigma: float) -> "torch.Tensor":
        x = torch.arange(ksize, dtype=torch.float32) - (ksize - 1) / 2.0
        g = torch.exp(-0.5 * (x / sigma) ** 2)
        return g / g.sum()

    class GaussianBlur2d(nn.Module):
        """Separable Gaussian blur, reflect border (kornia default)."""

        def __init__(self, kernel_size, sigma, border_type="reflect"):
            super().__init__()
            ky, kx = kernel_size
            sy, sx = sigma
            self.register_buffer("ky", _gaussian_kernel1d(ky, sy).view(1, 1, -1, 1))
            self.register_buffer("kx", _gaussian_kernel1d(kx, sx).view(1, 1, 1, -1))
            self.pad_y = ky // 2
            self.pad_x = kx // 2
            self.border = border_type

        def forward(self, x):
            b, c, h, w = x.shape
            y = x.reshape(b * c, 1, h, w)
            y = F.pad(y, (0, 0, self.pad_y, self.pad_y), mode=self.border)
            y = F.conv2d(y, self.ky)
            y = F.pad(y, (self.pad_x, self.pad_x, 0, 0), mode=self.border)
            y = F.conv2d(y, self.kx)
            return y.reshape(b, c, h, w)

    def rgb_to_hsv(image, eps: float = 1e-8):
        """RGB [B,3,H,W] in [0,1] -> HSV with h in [0, 2*pi]."""
        r, g, b = image[:, 0], image[:, 1], image[:, 2]
        maxc = torch.max(torch.max(r, g), b)
        minc = torch.min(torch.min(r, g), b)
        v = maxc
        deltac = maxc - minc
        s = deltac / (maxc + eps)
        safe = torch.where(deltac == 0, torch.ones_like(deltac), deltac)
        rc = (maxc - r) / safe
        gc = (maxc - g) / safe
        bc = (maxc - b) / safe
        h = torch.where(
            maxc == r, bc - gc, torch.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc)
        )
        h = torch.where(deltac == 0, torch.zeros_like(h), h)
        h = (h / 6.0) % 1.0
        h = h * (2.0 * math.pi)
        return torch.stack([h, s, v], dim=1)

    class VideoSequential(nn.Module):  # imported by fame.py, never used
        pass

    filters.GaussianBlur2d = GaussianBlur2d
    color.rgb_to_hsv = rgb_to_hsv
    container.VideoSequential = VideoSequential
    augmentation.container = container
    kornia.filters = filters
    kornia.color = color
    kornia.augmentation = augmentation
    _shim_spec(kornia, filters, color, augmentation, container)
    sys.modules.update(
        {
            "kornia": kornia,
            "kornia.filters": filters,
            "kornia.color": color,
            "kornia.augmentation": augmentation,
            "kornia.augmentation.container": container,
        }
    )


def _install_torchvision():
    if "torchvision" in sys.modules:
        return
    tv = types.ModuleType("torchvision")
    transforms = types.ModuleType("torchvision.transforms")
    tv_functional = types.ModuleType("torchvision.transforms.functional")
    transforms.functional = tv_functional
    datasets = types.ModuleType("torchvision.datasets")
    video_utils = types.ModuleType("torchvision.datasets.video_utils")

    class VideoClips:  # imported by fame.py, never used
        pass

    class Resize:
        """torchvision.transforms.Resize(int) semantics: resize the SHORT
        side to `size` preserving aspect (used by hat_decode.py:333 on
        PIL images)."""

        def __init__(self, size, interpolation=None):
            self.size = size

        def __call__(self, img):
            from PIL import Image as _Image

            w, h = img.size
            if w <= h:
                new = (self.size, int(self.size * h / w))
            else:
                new = (int(self.size * w / h), self.size)
            if new == (w, h):
                return img
            return img.resize(new, _Image.BILINEAR)

    transforms.Resize = Resize
    video_utils.VideoClips = VideoClips
    datasets.video_utils = video_utils
    tv.transforms = transforms
    tv.datasets = datasets
    _shim_spec(tv, transforms, tv_functional, datasets, video_utils)
    sys.modules.update(
        {
            "torchvision": tv,
            "torchvision.transforms": transforms,
            "torchvision.transforms.functional": tv_functional,
            "torchvision.datasets": datasets,
            "torchvision.datasets.video_utils": video_utils,
        }
    )


def _install_decord():
    if "decord" in sys.modules:
        return
    decord = types.ModuleType("decord")

    class _Unavailable:
        """Imported by the reference dataset modules (dataset/kinetics.py:4)
        when they are pulled in via a run-script import; trajectory tests
        never construct a dataset, so instantiation raises."""

        def __init__(self, *a, **k):
            raise NotImplementedError("decord shim: datasets not usable in tests")

    decord.VideoReader = _Unavailable
    decord.cpu = _Unavailable
    bridge = types.ModuleType("decord.bridge")
    bridge.set_bridge = lambda *a, **k: None
    decord.bridge = bridge
    _shim_spec(decord, bridge)
    sys.modules.update({"decord": decord, "decord.bridge": bridge})


def load_reference():
    """Install shims and put /root/reference on sys.path. Returns the path."""
    _install_timm()
    _install_kornia()
    _install_torchvision()
    _install_decord()
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    return REFERENCE_PATH


def torch_state_dict_to_numpy(module):
    import numpy as np  # noqa: F401

    # .copy(): .numpy() returns a VIEW of the live parameter — snapshots
    # taken before training would otherwise silently track the updates
    return {
        k: v.detach().cpu().float().numpy().copy()
        for k, v in module.state_dict().items()
    }
