"""End-to-end CLI smoke tests: each entry point runs 1-2 epochs on tiny
synthetic data (the reference has no such coverage — SURVEY.md §4)."""

import os

import pytest

TINY = [
    "img_size=16", "patch_size=8", "batch_size=4",
    "training_epochs=1", "warmup_epochs=0", "num_workers=1",
]


def test_config_loader_interpolation():
    from fastvim_tpu.config import load_config

    cfg = load_config("FastVimT", domain="classification",
                      overrides=["batch_size=8", "lr=0.01"])
    assert cfg["batch_size"] == 8
    assert cfg["lr"] == 0.01
    assert cfg["data"]["img_size"] == cfg["img_size"]


def test_cli_train_classification(tmp_path, tiny_model_patch):
    # full fastvim_tiny is too slow for CPU CI; the fixture shrinks the
    # registry models, and a handcrafted config exercises the wiring
    import yaml

    cfg = {
        "task": "classification", "seed": 0, "model": "fastvim_tiny",
        "num_classes": 5, "img_size": 16, "patch_size": 8, "channels": 3,
        "drop_path_rate": 0.0, "batch_size": 4, "num_workers": 1,
        "training_epochs": 1, "warmup_epochs": 0, "lr": 1e-3,
        "warmup_initial_lr": 0.0, "min_lr": 1e-5, "scaling_rule": "none",
        "weight_decay": 0.05, "use_ema_weights": True, "ema_decay": 0.99,
        "label_smoothing": 0.1, "mixup": 0.8, "cutmix": 1.0,
        "data": {"dir": None, "img_size": 16},
    }
    cfg_path = tmp_path / "tiny.yaml"
    cfg_path.write_text(yaml.dump(cfg))
    from fastvim_tpu.cli.train_classification import main as train_main

    state = train_main([
        "--config_name", str(cfg_path), "--model_save_dir",
        str(tmp_path / "out"), "--synthetic_samples", "8",
    ])
    assert int(state.step) >= 1
    assert os.path.exists(tmp_path / "out" / "log.csv")


def test_cli_train_classification_device_resident(tmp_path,
                                                  tiny_model_patch):
    """device_resident: the whole epoch is one device program (data/
    device.py) — wiring through the CLI, CSV log, checkpoint, EMA eval
    columns."""
    import csv

    import yaml

    cfg = {
        "task": "classification", "seed": 0, "model": "fastvim_tiny",
        "num_classes": 10, "img_size": 16, "patch_size": 8,
        "channels": 3, "drop_path_rate": 0.0, "batch_size": 128,
        "num_workers": 1, "training_epochs": 1, "warmup_epochs": 0,
        "lr": 1e-3, "warmup_initial_lr": 0.0, "min_lr": 1e-5,
        "scaling_rule": "none", "weight_decay": 0.05,
        "use_ema_weights": True, "ema_decay": 0.99,
        "label_smoothing": 0.1, "mixup": 0.0, "cutmix": 0.0,
        "data": {"dir": "digits", "img_size": 16,
                 "device_resident": True},
    }
    cfg_path = tmp_path / "dev.yaml"
    cfg_path.write_text(yaml.dump(cfg))
    from fastvim_tpu.cli.train_classification import main as train_main

    state = train_main([
        "--config_name", str(cfg_path), "--model_save_dir",
        str(tmp_path / "out"),
    ])
    assert int(state.step) == 1497 // 128  # one device-program epoch
    with open(tmp_path / "out" / "log.csv") as f:
        [row] = list(csv.DictReader(f))
    assert float(row["val_acc"]) >= 0.0
    assert "val_acc_ema" in row and float(row["train_loss"]) > 0


@pytest.fixture
def tiny_model_patch(monkeypatch):
    """Shrink registry models so CLI smoke tests run fast on CPU."""
    from fastvim_tpu.models import registry as reg

    def tiny_factory(**kw):
        from fastvim_tpu.models.vision_mamba import VisionMamba

        kw.setdefault("ssm_cfg", {"d_state": 4})
        kw.update(depth=2, embed_dim=32)
        kw.setdefault("img_size", 16)
        kw.setdefault("patch_size", 8)
        return VisionMamba(**{k: v for k, v in kw.items()
                              if k in VisionMamba.__dataclass_fields__})

    def tiny_mae_factory(**kw):
        from fastvim_tpu.models.mae import MaskedAutoencoderVim

        kw.setdefault("ssm_cfg", {"d_state": 4})
        kw.update(depth=2, embed_dim=32, decoder_embed_dim=16,
                  decoder_depth=1)
        kw.setdefault("img_size", 16)
        kw.setdefault("patch_size", 8)
        return MaskedAutoencoderVim(
            **{k: v for k, v in kw.items()
               if k in MaskedAutoencoderVim.__dataclass_fields__})

    def tiny_channel_factory(**kw):
        from fastvim_tpu.models.channel import ChannelVisionMamba

        kw.setdefault("ssm_cfg", {"d_state": 4})
        kw.update(depth=2, embed_dim=32)
        kw.setdefault("img_size", 16)
        kw.setdefault("patch_size", 8)
        return ChannelVisionMamba(
            **{k: v for k, v in kw.items()
               if k in ChannelVisionMamba.__dataclass_fields__})

    for name in list(reg._REGISTRY):
        if "mae" in name:
            monkeypatch.setitem(reg._REGISTRY, name, tiny_mae_factory)
        elif "channel" in name.lower():
            monkeypatch.setitem(reg._REGISTRY, name, tiny_channel_factory)
        else:
            monkeypatch.setitem(reg._REGISTRY, name, tiny_factory)
    yield


def test_cli_pretrain_mae(tmp_path, tiny_model_patch):
    from fastvim_tpu.cli.pretrain_mae import main

    state = main([
        "--config_name", "pretrain_FastVimT",
        "--model_save_dir", str(tmp_path / "out"),
        "--synthetic_samples", "8",
        *TINY,
    ])
    assert int(state.step) >= 1


def test_cli_train_cells(tmp_path, tiny_model_patch):
    from fastvim_tpu.cli.train_cells import main

    state = main([
        "--config_name", "FastChannelVimS",
        "--model_save_dir", str(tmp_path / "out"),
        "--synthetic_samples", "8",
        *TINY, "channels=3",
        "data.normalization_mean=null", "data.normalization_std=null",
    ])
    assert int(state.step) >= 1


def test_cli_finetune_then_linear(tmp_path, tiny_model_patch):
    """MAE pretrain checkpoint → finetune with surgery → linear probe."""
    from fastvim_tpu.cli.finetune_mae import main as ft_main
    from fastvim_tpu.cli.linear_probe import main as lp_main
    from fastvim_tpu.cli.pretrain_mae import main as pt_main

    pt_state = pt_main([
        "--config_name", "pretrain_FastVimT",
        "--model_save_dir", str(tmp_path / "pt"),
        "--synthetic_samples", "8", *TINY,
    ])
    import os

    ckpts = os.listdir(tmp_path / "pt" / "ckpt")
    ckpt = str(tmp_path / "pt" / "ckpt" / sorted(ckpts)[-1])
    ft_state = ft_main([
        "--config_name", "finetune_FastVimB",
        "--model_save_dir", str(tmp_path / "ft"),
        "--synthetic_samples", "8", *TINY,
        "model=fastvim_tiny", "num_classes=5",
        f"pretrained_checkpoint_path={ckpt}",
    ])
    assert int(ft_state.step) >= 1
    lp_state = lp_main([
        "--config_name", "linear_FastVimL",
        "--model_save_dir", str(tmp_path / "lp"),
        "--synthetic_samples", "8", *TINY,
        "model=fastvim_tiny", "num_classes=5",
        f"pretrained_checkpoint_path={ckpt}",
    ])
    assert int(lp_state.step) >= 1


def test_cli_extract_features(tiny_model_patch):
    from fastvim_tpu.cli.extract_features import main

    feats = main([
        "--config_name", "upernet_FastVimT_ade20k",
        "img_size=16", "patch_size=8", "out_indices=[1]", "--with_fpn",
    ])
    assert len(feats) == 1
    assert feats[0].shape == (1, 2, 2, 32)


def test_cli_train_detection(tmp_path, tiny_model_patch):
    """End-to-end detection CLI: synthetic LSJ data → cascade losses →
    a training step (mirrors detection/tools/train.py wiring)."""
    from fastvim_tpu.cli.train_detection import main

    state = main([
        "--config_name", "vitdet_FastVimT_coco",
        "--model_save_dir", str(tmp_path / "out"),
        "--synthetic_samples", "4",
        "img_size=64", "batch_size=2", "num_classes=3", "max_gt=4",
        "training_epochs=1", "num_workers=1",
        "out_indices=[1]", "grad_compression=null",
        "det.rpn_sample=16", "det.nms_pre=32", "det.num_proposals=16",
        "det.rcnn_sample=8", "milestones=[100]", "warmup_iters=2",
    ])
    assert int(state.step) >= 1
    assert os.path.exists(tmp_path / "out" / "log.csv")


def test_cli_train_segmentation_with_miou(tmp_path, tiny_model_patch):
    """Seg CLI: synthetic data → train steps → mIoU eval at the end →
    checkpoint; then the checkpoint-in → mIoU-out eval_only path."""
    from fastvim_tpu.cli.train_segmentation import main

    common = [
        "--config_name", "upernet_FastVimT_ade20k",
        "--model_save_dir", str(tmp_path / "out"),
        "--synthetic_samples", "4",
        "img_size=32", "batch_size=2", "num_classes=5",
        "out_indices=[0,1]", "aux_index=1", "num_workers=1",
        "eval_batch_size=1",
    ]
    state = main(common + ["--total_iters", "2", "--eval_every", "2"])
    assert int(state.step) == 2
    assert os.path.exists(tmp_path / "out" / "log.csv")
    miou = main(common + ["--eval_only"])
    assert 0.0 <= miou <= 1.0


def test_cli_detection_eval_only(tmp_path, tiny_model_patch):
    """Checkpoint-in → box-AP-out path (mmdet test.py counterpart)."""
    from fastvim_tpu.cli.train_detection import main

    m = main([
        "--config_name", "vitdet_FastVimT_coco",
        "--synthetic_samples", "2", "--eval_only",
        "img_size=64", "batch_size=1", "num_classes=3", "max_gt=4",
        "num_workers=1", "out_indices=[1]", "grad_compression=null",
        "det.rpn_sample=16", "det.nms_pre=32", "det.num_proposals=16",
        "det.rcnn_sample=8",
    ])
    assert 0.0 <= m["box_ap50"] <= 1.0
    assert 0.0 <= m["mask_ap50"] <= 1.0


def test_detection_configs_disable_megakernel():
    """Round-5 regression pin: the fused ADJOINT backward reproducibly
    crashed the TPU worker inside the detection train program (bisect in
    docs/PERF.md §12 — same kernels/shapes pass standalone and in seg),
    so detection configs ship the XLA backbone path. If this flips back
    to auto/on, re-run benchmarks/probe512_tpu.py and the det family on
    hardware first."""
    from fastvim_tpu.cli.train_detection import build_model
    from fastvim_tpu.config import load_config

    for name in ("vitdet_FastVimT_coco", "vitdet_FastVimS_coco",
                 "vitdet_FastVimB_coco"):
        cfg = load_config(name, domain="detection")
        assert cfg.get("layer_fused") == "off", name
        model, _ = build_model(dict(cfg, img_size=64))
        assert model.backbone.layer_fused == "off", name
