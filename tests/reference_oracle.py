"""Import the torch reference at /root/reference as a *test oracle*.

The reference depends on GPU-era packages absent from this image (xformers,
kiui, roma, fairscale, open_clip, tyro...). For CPU parity tests we only
need the pure-torch module math, so the missing packages are stubbed with
just the attributes touched at import time. Nothing from the reference is
copied into the package — these imports exist only so converter/forward
parity can be asserted against the authoritative implementation.
"""

import importlib
import sys
import types

_REF = "/root/reference"
_READY = False


def _stub(name, **attrs):
    m = types.ModuleType(name)
    m.__path__ = []
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


def setup():
    global _READY
    if _READY:
        return
    if _REF not in sys.path:
        sys.path.insert(0, _REF)

    import torch

    for name in (
        "roma", "tyro", "xformers", "xformers.ops", "rotary_embedding_torch",
        "fairscale", "fairscale.nn", "fairscale.nn.checkpoint", "open_clip",
        "webdataset", "albumentations", "kiui", "kiui.lpips", "kiui.op",
        "kiui.cam", "kiui.typing", "kiui.grid_put", "kiui.nn",
        "torchvision", "torchvision.transforms",
        "torchvision.transforms.functional", "diff_gaussian_rasterization",
    ):
        if name not in sys.modules:
            _stub(name)

    sys.modules["kiui.lpips"].LPIPS = object
    sys.modules["kiui.op"].safe_normalize = (
        lambda x, eps=1e-20: x / torch.sqrt(
            torch.clamp(torch.sum(x * x, -1, keepdim=True), min=eps)
        )
    )
    sys.modules["kiui.cam"].orbit_camera = None
    sys.modules["fairscale.nn.checkpoint"].checkpoint_wrapper = lambda m: m

    # the reference hardcodes .cuda() in one forward path
    # (unet_i2vgen.py:334); make it a no-op on this CPU-only image
    if not torch.cuda.is_available():
        torch.Tensor.cuda = lambda self, *a, **k: self

    class _RotaryEmbedding:
        """Functional pure-torch stand-in for rotary-embedding-torch's
        RotaryEmbedding (theta=10000, interleaved pair rotation of the first
        `dim` channels, applied over the second-to-last axis) — enough for
        the reference TemporalAttentionBlock (util.py:937-939)."""

        def __init__(self, dim, *a, **k):
            self.dim = dim

        def rotate_queries_or_keys(self, x):
            n, d = x.shape[-2], x.shape[-1]
            rot = min(self.dim, d)
            inv = 1.0 / (
                10000 ** (torch.arange(0, rot, 2, dtype=torch.float32) / rot)
            )
            freqs = torch.outer(torch.arange(n, dtype=torch.float32), inv)
            freqs = freqs.repeat_interleave(2, dim=-1)
            xl, xr = x[..., :rot], x[..., rot:]
            x1, x2 = xl[..., 0::2], xl[..., 1::2]
            rot_half = torch.stack((-x2, x1), dim=-1).reshape(xl.shape)
            xl = xl * freqs.cos() + rot_half * freqs.sin()
            return torch.cat([xl, xr], dim=-1)

    sys.modules["rotary_embedding_torch"].RotaryEmbedding = _RotaryEmbedding
    class _LowerTriangularMask:
        pass

    def _mea(q, k, v, attn_bias=None, op=None):
        # pure-torch equivalent of xformers.ops.memory_efficient_attention
        # for [B*H, S, D] inputs (the only layout the reference uses)
        scale = q.shape[-1] ** -0.5
        logits = q @ k.transpose(-2, -1) * scale
        if isinstance(attn_bias, _LowerTriangularMask):
            s_q, s_k = logits.shape[-2:]
            causal = torch.ones(s_q, s_k, dtype=torch.bool).tril()
            logits = logits.masked_fill(~causal, float("-inf"))
        elif attn_bias is not None:
            logits = logits + attn_bias
        return torch.softmax(logits, dim=-1) @ v

    sys.modules["xformers.ops"].memory_efficient_attention = _mea
    sys.modules["xformers.ops"].LowerTriangularMask = _LowerTriangularMask
    sys.modules["xformers"].ops = sys.modules["xformers.ops"]
    sys.modules["torchvision"].transforms = sys.modules["torchvision.transforms"]
    sys.modules["torchvision.transforms"].functional = sys.modules[
        "torchvision.transforms.functional"
    ]
    sys.modules["diff_gaussian_rasterization"].GaussianRasterizationSettings = object
    sys.modules["diff_gaussian_rasterization"].GaussianRasterizer = object
    sys.modules["tyro"].extras = types.SimpleNamespace(
        subcommand_type_from_defaults=lambda *a, **k: None
    )
    sys.modules["tyro"].conf = types.SimpleNamespace(FlagConversionOff=None)

    # register lightweight package shells for the reference's aggregating
    # packages so `tools.modules.unet.unet_t2v` imports WITHOUT executing
    # tools/__init__.py (which pulls in every engine and its kitchen sink)
    for pkg, sub in (
        ("tools", "tools"),
        ("tools.modules", "tools/modules"),
        ("tools.modules.unet", "tools/modules/unet"),
        ("tools.modules.diffusions", "tools/modules/diffusions"),
        ("tools.datasets", "tools/datasets"),
    ):
        if pkg not in sys.modules:
            m = types.ModuleType(pkg)
            m.__path__ = [f"{_REF}/{sub}"]
            sys.modules[pkg] = m
    _READY = True


def load(module_name):
    """setup() + import a reference module (e.g. 'tools.modules.autoencoder')."""
    setup()
    return importlib.import_module(module_name)
