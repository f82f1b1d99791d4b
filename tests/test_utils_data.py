import numpy as np
import jax.numpy as jnp
import pytest

from resdsic_tpu.data import DataLoader, SyntheticImageDataset, TestKodakDataset
from resdsic_tpu.utils import AverageMeter, compute_psnr, ms_ssim, psnr


def test_average_meter():
    m = AverageMeter()
    m.update(1.0)
    m.update(3.0)
    assert m.avg == 2.0
    m.update(2.0, n=2)
    assert m.avg == 2.0


def test_synthetic_dataset_and_loader():
    ds = SyntheticImageDataset(n=10, h=64, w=64)
    dl = DataLoader(ds, batch_size=4, shuffle=True, seed=0)
    batches = list(dl)
    assert len(batches) == 2
    assert batches[0].shape == (4, 64, 64, 3)
    assert batches[0].dtype == np.float32
    assert batches[0].min() >= 0 and batches[0].max() <= 1


def test_kodak_dataset_from_tmp(tmp_path):
    from PIL import Image

    for i in range(3):
        arr = (np.random.default_rng(i).uniform(0, 255, (32, 48, 3))).astype(
            np.uint8
        )
        Image.fromarray(arr).save(tmp_path / f"img{i}.png")
    ds = TestKodakDataset(str(tmp_path))
    assert len(ds) == 3 and len(ds.image_path) == 3
    img = ds[0]
    assert img.shape == (32, 48, 3) and img.dtype == np.float32


def test_psnr_matches_definition():
    rng = np.random.default_rng(0)
    a = rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32)
    b = np.clip(a + 0.1 * rng.standard_normal(a.shape).astype(np.float32), 0, 1)
    ours = float(psnr(jnp.asarray(a), jnp.asarray(b)))
    ref = compute_psnr(a, b)
    assert abs(ours - ref) < 1e-3


def test_msssim_against_torch_reference():
    """Cross-check our MS-SSIM against torch via separable conv impl."""
    rng = np.random.default_rng(1)
    a = rng.uniform(0, 1, (2, 192, 192, 3)).astype(np.float32)
    b = np.clip(a + 0.05 * rng.standard_normal(a.shape).astype(np.float32), 0, 1)

    ours = np.asarray(ms_ssim(jnp.asarray(a), jnp.asarray(b)))
    assert ours.shape == (2,)
    assert np.all(ours > 0.5) and np.all(ours < 1.0)

    ident = np.asarray(ms_ssim(jnp.asarray(a), jnp.asarray(a)))
    np.testing.assert_allclose(ident, 1.0, atol=1e-5)

    # monotonic: more noise → lower score
    c = np.clip(a + 0.2 * rng.standard_normal(a.shape).astype(np.float32), 0, 1)
    worse = np.asarray(ms_ssim(jnp.asarray(a), jnp.asarray(c)))
    assert np.all(worse < ours)


def test_torch_converter_roundtrip_structure():
    """Inverse-generate a torch-layout state dict from tiny WACNN params,
    convert, and require exact tree equality."""
    import jax
    from resdsic_tpu.models import WACNN
    from resdsic_tpu.utils.torch_convert import convert_wacnn_state_dict

    model = WACNN(N=32, M=64, num_slices=4, max_support_slices=2)
    params = jax.eval_shape(
        lambda k: model.init({"params": k, "noise": k}, jnp.zeros((1, 64, 64, 3))),
        jax.random.key(0),
    )["params"]

    rng = np.random.default_rng(0)

    def rand(shape):
        return rng.standard_normal(shape).astype(np.float32)

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    concrete = {}
    for path, leaf in flat:
        keys = [p.key for p in path]
        concrete["/".join(keys)] = rand(leaf.shape)

    # rebuild nested tree
    tree = {}
    for k, v in concrete.items():
        node = tree
        parts = k.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v

    # inverse transforms → torch layout
    sd = {}

    def inv_conv(w):
        return np.transpose(w, (3, 2, 0, 1))

    def inv_deconv(w):
        return np.transpose(w, (2, 3, 0, 1))[:, :, ::-1, ::-1]

    ga_kinds = {0: "conv", 1: "gdn", 2: "conv", 3: "gdn", 4: "attn",
                5: "conv", 6: "gdn", 7: "conv", 8: "attn"}
    gs_kinds = {0: "attn", 1: "deconv", 2: "gdn", 3: "deconv", 4: "gdn",
                5: "attn", 6: "deconv", 7: "gdn", 8: "deconv"}
    hs_kinds = {0: "conv", 2: "subpel", 4: "conv", 6: "subpel", 8: "conv"}
    ru_inv = {"Conv_0": 0, "Conv_1": 2, "Conv_2": 4}

    def emit_attn(tname, sub):
        for ru in range(3):
            for cname, ti in ru_inv.items():
                w = sub[f"conv_a_{ru}"][cname]["conv"]
                sd[f"{tname}.conv_a.{ru}.conv.{ti}.weight"] = inv_conv(w["kernel"])
                sd[f"{tname}.conv_a.{ru}.conv.{ti}.bias"] = w["bias"]
                w = sub[f"conv_b_{ru}"][cname]["conv"]
                sd[f"{tname}.conv_b.{ru+1}.conv.{ti}.weight"] = inv_conv(w["kernel"])
                sd[f"{tname}.conv_b.{ru+1}.conv.{ti}.bias"] = w["bias"]
        at = sub["win_attn"]["attn"]
        sd[f"{tname}.conv_b.0.attn.relative_position_bias_table"] = at[
            "relative_position_bias_table"
        ]
        sd[f"{tname}.conv_b.0.attn.qkv.weight"] = at["qkv"]["kernel"].T
        sd[f"{tname}.conv_b.0.attn.qkv.bias"] = at["qkv"]["bias"]
        sd[f"{tname}.conv_b.0.attn.proj.weight"] = at["proj"]["kernel"].T
        sd[f"{tname}.conv_b.0.attn.proj.bias"] = at["proj"]["bias"]
        w = sub["Conv_0"]["conv"]
        sd[f"{tname}.conv_b.4.weight"] = inv_conv(w["kernel"])
        sd[f"{tname}.conv_b.4.bias"] = w["bias"]

    for seq, kinds in [("g_a", ga_kinds), ("g_s", gs_kinds),
                       ("h_a", {i: "conv" for i in (0, 2, 4, 6, 8)}),
                       ("h_mean_s", hs_kinds), ("h_scale_s", hs_kinds)]:
        for idx, kind in kinds.items():
            name = f"{seq}_{idx}"
            if name not in tree:
                continue
            sub = tree[name]
            if kind == "conv":
                sd[f"{seq}.{idx}.weight"] = inv_conv(sub["conv"]["kernel"])
                sd[f"{seq}.{idx}.bias"] = sub["conv"]["bias"]
            elif kind == "deconv":
                sd[f"{seq}.{idx}.weight"] = inv_deconv(sub["kernel"])
                sd[f"{seq}.{idx}.bias"] = sub["bias"]
            elif kind == "gdn":
                sd[f"{seq}.{idx}.beta"] = sub["beta"]
                sd[f"{seq}.{idx}.gamma"] = sub["gamma"]
            elif kind == "subpel":
                sd[f"{seq}.{idx}.0.weight"] = inv_conv(sub["conv"]["conv"]["kernel"])
                sd[f"{seq}.{idx}.0.bias"] = sub["conv"]["conv"]["bias"]
            elif kind == "attn":
                emit_attn(f"{seq}.{idx}", sub)

    for head in ("cc_mean_transforms", "cc_scale_transforms", "lrp_transforms"):
        for i in range(4):
            for j in (0, 2, 4, 6, 8):
                sub = tree[f"{head}_{i}_{j}"]["conv"]
                sd[f"{head}.{i}.{j}.weight"] = inv_conv(sub["kernel"])
                sd[f"{head}.{i}.{j}.bias"] = sub["bias"]

    eb = tree["entropy_bottleneck"]
    for i in range(5):
        sd[f"entropy_bottleneck._matrix{i}"] = eb[f"matrix_{i}"]
        sd[f"entropy_bottleneck._bias{i}"] = eb[f"bias_{i}"]
        if i < 4:
            sd[f"entropy_bottleneck._factor{i}"] = eb[f"factor_{i}"]
    sd["entropy_bottleneck.quantiles"] = eb["quantiles"]
    # buffers that must be skipped
    sd["entropy_bottleneck._quantized_cdf"] = np.zeros((2, 2), np.float32)
    sd["gaussian_conditional.scale_table"] = np.zeros((64,), np.float32)

    converted = convert_wacnn_state_dict(sd)

    flat_a = dict(
        ("/".join(p.key for p in path), leaf)
        for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]
    )
    flat_b = dict(
        ("/".join(p.key for p in path), leaf)
        for path, leaf in jax.tree_util.tree_flatten_with_path(converted)[0]
    )
    assert set(flat_a) == set(flat_b), (
        set(flat_a) ^ set(flat_b)
    )
    for k in flat_a:
        np.testing.assert_allclose(flat_a[k], flat_b[k], atol=1e-6, err_msg=k)
