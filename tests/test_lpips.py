"""LPIPS tower: metric properties, converter parity vs an independent torch
replica of the richzhang architecture, and the LGM-refine loss wiring."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videomv_tpu.models.lpips import LPIPS, _SLICES, _CHANNELS, convert_lpips


@pytest.fixture(scope="module")
def lpips_setup():
    model = LPIPS()
    x = jnp.zeros((1, 3, 32, 32))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x, x)
    apply = jax.jit(model.apply)
    return model, params, apply


def test_lpips_metric_properties(lpips_setup):
    model, params, apply = lpips_setup
    rng = jax.random.PRNGKey(1)
    a = jax.random.uniform(rng, (2, 3, 32, 32), minval=-1, maxval=1)
    b = jnp.clip(a + 0.3, -1, 1)
    d_same = apply(params, a, a)
    d_diff = apply(params, a, b)
    assert d_same.shape == (2,)
    np.testing.assert_allclose(np.asarray(d_same), 0.0, atol=1e-6)
    assert float(jnp.abs(d_diff).sum()) > 0


def _torch_replica_and_sd(seed=0):
    """Independent torch LPIPS (richzhang structure) with random weights,
    returning (forward_fn, state_dict with kiui-style keys)."""
    import torch
    import torch.nn as tnn
    import torch.nn.functional as F

    torch.manual_seed(seed)
    convs = {}
    cin = 3
    ch_iter = iter(_CHANNELS)
    for si, conv_ids in enumerate(_SLICES):
        for ci in conv_ids:
            cout = next(ch_iter)
            convs[(si, ci)] = tnn.Conv2d(cin, cout, 3, padding=1)
            cin = cout
    taps_ch = [64, 128, 256, 512, 512]
    lins = [tnn.Conv2d(c, 1, 1, bias=False) for c in taps_ch]

    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

    def tower(x):
        x = (x - shift) / scale
        taps = []
        for si, conv_ids in enumerate(_SLICES):
            if si > 0:
                x = F.max_pool2d(x, 2, 2)
            for ci in conv_ids:
                x = F.relu(convs[(si, ci)](x))
            taps.append(x)
        return taps

    def norm(t):
        return t / (t.pow(2).sum(dim=1, keepdim=True).sqrt() + 1e-10)

    def forward(x0, x1):
        t0, t1 = tower(x0), tower(x1)
        total = 0.0
        for i, (a, b) in enumerate(zip(t0, t1)):
            d = (norm(a) - norm(b)) ** 2
            total = total + lins[i](d).mean(dim=(1, 2, 3))
        return total

    sd = {}
    for (si, ci), m in convs.items():
        sd[f"net.slice{si + 1}.{ci}.weight"] = m.weight.detach().numpy()
        sd[f"net.slice{si + 1}.{ci}.bias"] = m.bias.detach().numpy()
    for i, m in enumerate(lins):
        sd[f"lin{i}.model.1.weight"] = m.weight.detach().numpy()
    sd["scaling_layer.shift"] = shift.numpy()
    sd["scaling_layer.scale"] = scale.numpy()
    return forward, sd


def test_lpips_converter_forward_parity(lpips_setup):
    """convert_lpips on a kiui-style state dict must reproduce the torch
    forward to float32 precision — proves kernel layout + slice indexing."""
    import torch

    model, params, apply = lpips_setup
    t_forward, sd = _torch_replica_and_sd()

    new_params, report = convert_lpips(sd, params, strict=True)

    rng = np.random.default_rng(7)
    x0 = rng.uniform(-1, 1, (2, 3, 32, 32)).astype(np.float32)
    x1 = rng.uniform(-1, 1, (2, 3, 32, 32)).astype(np.float32)
    want = t_forward(torch.from_numpy(x0), torch.from_numpy(x1)).detach().numpy()
    got = np.asarray(apply(new_params, jnp.asarray(x0), jnp.asarray(x1)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_lpips_converter_accepts_modulelist_keys(lpips_setup):
    model, params, _ = lpips_setup
    _, sd = _torch_replica_and_sd()
    sd2 = {}
    for k, v in sd.items():
        if k.startswith("lin") and not k.startswith("lins"):
            idx = k[3]
            sd2["lins." + idx + k[4:]] = v
        else:
            sd2[k] = v
    _, report = convert_lpips(sd2, params, strict=True)
    assert not report["missing"] and not report["mismatched"]
