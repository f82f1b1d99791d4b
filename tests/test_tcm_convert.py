"""Structural roundtrip test for the TCM torch-checkpoint converter."""

import jax
import jax.numpy as jnp
import numpy as np

from resdsic_tpu.models import TCM
from resdsic_tpu.utils.torch_convert_tcm import convert_tcm_state_dict


def _flat(tree):
    return {
        "/".join(p.key for p in path): leaf
        for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]
    }


def test_tcm_converter_structural_roundtrip():
    config = (1, 1, 1, 1, 1, 1)
    model = TCM(
        N=32, M=64, num_slices=2, max_support_slices=1,
        config=config, head_dim=(8, 8, 8, 8, 8, 8),
        window_size=4, hyper_ch=48,
    )
    shapes = jax.eval_shape(
        lambda k: model.init({"params": k, "noise": k},
                             jnp.zeros((1, 128, 128, 3))),
        jax.random.key(0),
    )["params"]

    rng = np.random.default_rng(0)
    ours = {
        k: rng.standard_normal(v.shape).astype(np.float32)
        for k, v in _flat(shapes).items()
    }

    def inv_conv(w):
        return np.transpose(w, (3, 2, 0, 1))

    def inv_linear(w):
        return np.ascontiguousarray(w.T)

    sd = {}
    for key, v in ours.items():
        parts = key.split("/")
        top = parts[0]
        m = None
        for head in ("g_a", "g_s", "h_a", "h_mean_s", "h_scale_s",
                     "atten_mean", "atten_scale",
                     "cc_mean_transforms", "cc_scale_transforms",
                     "lrp_transforms", "entropy_bottleneck"):
            if top.startswith(head) and (
                top == head or top[len(head)] == "_"
            ):
                m = head
                break
        assert m is not None, key

        if m == "entropy_bottleneck":
            leaf = parts[1]
            if leaf.startswith("matrix_"):
                sd[f"entropy_bottleneck._matrix{leaf[7:]}"] = v
            elif leaf.startswith("bias_"):
                sd[f"entropy_bottleneck._bias{leaf[5:]}"] = v
            elif leaf.startswith("factor_"):
                sd[f"entropy_bottleneck._factor{leaf[7:]}"] = v
            else:
                sd["entropy_bottleneck.quantiles"] = v
            continue

        if m in ("cc_mean_transforms", "cc_scale_transforms", "lrp_transforms"):
            # top = f"{m}_{i}_{j}"
            i, j = top[len(m) + 1 :].split("_")
            leaf = "weight" if parts[-1] == "kernel" else "bias"
            sd[f"{m}.{i}.{j}.{leaf}"] = inv_conv(v) if leaf == "weight" else v
            continue

        if m in ("atten_mean", "atten_scale"):
            i = top[len(m) + 1 :]
            tname = f"{m}.{i}.0"
            rest = parts[1:]
            sd_key, tv = _inv_swatten(tname, rest, v, inv_conv, inv_linear)
            sd[sd_key] = tv
            continue

        # sequential stages — kind-aware inverse (RBU names differ from RBWS)
        idx = int(top[len(m) + 1 :])
        kind = _kind_tables(config)[m][idx]
        tname = f"{m}.{idx}"
        rest = parts[1:]
        sd_key, tv = _inv_seq_member(tname, kind, rest, v, inv_conv, inv_linear)
        sd[sd_key] = tv

    converted = convert_tcm_state_dict(sd, config=config)
    conv_flat = _flat(converted)
    assert set(conv_flat) == set(ours), (
        sorted(set(ours) ^ set(conv_flat))[:10]
    )
    for k in ours:
        np.testing.assert_allclose(conv_flat[k], ours[k], atol=1e-6, err_msg=k)


def _inv_block(tname, rest, v, inv_linear):
    if rest[0] in ("ln1", "ln2"):
        leaf = "weight" if rest[1] == "scale" else "bias"
        return f"{tname}.{rest[0]}.{leaf}", v
    if rest[0] == "msa":
        if rest[1] == "relative_position_params":
            return f"{tname}.msa.relative_position_params", v
        leaf = "weight" if rest[-1] == "kernel" else "bias"
        tv = inv_linear(v) if leaf == "weight" else v
        return f"{tname}.msa.{rest[1]}.{leaf}", tv
    if rest[0] in ("mlp_0", "mlp_2"):
        idx = rest[0][-1]
        leaf = "weight" if rest[-1] == "kernel" else "bias"
        tv = inv_linear(v) if leaf == "weight" else v
        return f"{tname}.mlp.{idx}.{leaf}", tv
    raise KeyError(rest)


def _inv_ru(tname, rest, v, inv_conv):
    conv_idx = {"Conv_0": "0", "Conv_1": "2", "Conv_2": "4"}[rest[0]]
    leaf = "weight" if rest[-1] == "kernel" else "bias"
    return f"{tname}.conv.{conv_idx}.{leaf}", (
        inv_conv(v) if leaf == "weight" else v
    )


def _inv_swatten(tname, rest, v, inv_conv, inv_linear):
    if rest[0] in ("in_conv", "out_conv"):
        leaf = "weight" if rest[-1] == "kernel" else "bias"
        return f"{tname}.{rest[0]}.{leaf}", inv_conv(v) if leaf == "weight" else v
    if rest[0] == "non_local_block":
        return _inv_block(f"{tname}.non_local_block.{rest[1]}", rest[2:], v,
                          inv_linear)
    if rest[0].startswith("conv_a_"):
        return _inv_ru(f"{tname}.conv_a.{rest[0][-1]}", rest[1:], v, inv_conv)
    if rest[0] == "conv_b_out":
        leaf = "weight" if rest[-1] == "kernel" else "bias"
        return f"{tname}.conv_b.3.{leaf}", inv_conv(v) if leaf == "weight" else v
    if rest[0].startswith("conv_b_"):
        return _inv_ru(f"{tname}.conv_b.{rest[0][-1]}", rest[1:], v, inv_conv)
    raise KeyError(rest)


def _kind_tables(config):
    from resdsic_tpu.utils.torch_convert_tcm import convert_tcm_state_dict  # noqa

    c = list(config)
    ga = {0: "rbws"}
    i = 1
    for n, closer in ((c[0], "rbws"), (c[1], "rbws"), (c[2], "conv")):
        for _ in range(n):
            ga[i] = "ctb"; i += 1
        ga[i] = closer; i += 1
    gs = {0: "rbu"}
    i = 1
    for n, closer in ((c[3], "rbu"), (c[4], "rbu"), (c[5], "subpel")):
        for _ in range(n):
            gs[i] = "ctb"; i += 1
        gs[i] = closer; i += 1
    ha = {0: "rbws"}
    for j in range(c[0]):
        ha[1 + j] = "ctb"
    ha[1 + c[0]] = "conv"
    hs = {0: "rbu"}
    for j in range(c[3]):
        hs[1 + j] = "ctb"
    hs[1 + c[3]] = "subpel"
    return {"g_a": ga, "g_s": gs, "h_a": ha, "h_mean_s": hs, "h_scale_s": hs}


def _inv_seq_member(tname, kind, rest, v, inv_conv, inv_linear):
    leaf = "weight" if rest[-1] == "kernel" else "bias"
    if kind == "conv":
        return f"{tname}.{leaf}", inv_conv(v) if leaf == "weight" else v
    if kind == "subpel":
        return f"{tname}.0.{leaf}", inv_conv(v) if leaf == "weight" else v
    if kind == "rbws":
        if rest[0] == "GDN_0":
            return f"{tname}.gdn.{rest[1]}", v
        name = {"Conv_0": "conv1", "Conv_1": "conv2", "Conv_2": "skip"}[rest[0]]
        return f"{tname}.{name}.{leaf}", inv_conv(v) if leaf == "weight" else v
    if kind == "rbu":
        if rest[0] == "GDN_0":
            return f"{tname}.igdn.{rest[1]}", v
        if rest[0] == "Conv_0":
            return f"{tname}.conv.{leaf}", inv_conv(v) if leaf == "weight" else v
        name = "subpel_conv" if rest[0].endswith("_0") else "upsample"
        return f"{tname}.{name}.0.{leaf}", inv_conv(v) if leaf == "weight" else v
    if kind == "ctb":
        if rest[0] in ("conv1_1", "conv1_2"):
            return f"{tname}.{rest[0]}.{leaf}", inv_conv(v) if leaf == "weight" else v
        if rest[0] == "conv_block":
            name = {"Conv_0": "conv1", "Conv_1": "conv2", "Conv_2": "skip"}[rest[1]]
            return (f"{tname}.conv_block.{name}.{leaf}",
                    inv_conv(v) if leaf == "weight" else v)
        if rest[0] == "trans_block":
            return _inv_block(f"{tname}.trans_block", rest[1:], v, inv_linear)
    raise KeyError((tname, kind, rest))
