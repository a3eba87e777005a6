"""run_training loop tests: logging, checkpointing, crash-resume."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from fastvim_tpu.models import VisionMamba
from fastvim_tpu.train import (
    TrainState,
    cosine_with_warmup,
    make_optimizer,
    make_supervised_eval_step,
    make_supervised_train_step,
)
from fastvim_tpu.train.loop import run_training


class FakeLoader:
    def __init__(self, n_batches, batch, img, classes):
        self.batches = []
        for i in range(n_batches):
            rng = np.random.default_rng(i)
            self.batches.append({
                "image": rng.standard_normal(
                    (batch, img, img, 3)).astype(np.float32),
                "label": (np.arange(batch) + i) % classes,
            })

    def __len__(self):
        return len(self.batches)

    def __iter__(self):
        return iter(self.batches)


def make_everything():
    model = VisionMamba(img_size=16, patch_size=8, depth=2, embed_dim=32,
                        num_classes=5, drop_path_rate=0.0,
                        ssm_cfg=dict(d_state=4))
    x0 = jnp.zeros((2, 16, 16, 3))
    params = model.init(jax.random.PRNGKey(0), x0)
    tx = make_optimizer(cosine_with_warmup(1e-3, 1e-5, 100, 5),
                        weight_decay=0.01, params=params)
    state = TrainState.create(
        jax.tree_util.tree_map(jnp.copy, params), tx, ema=True)
    step = make_supervised_train_step(model, 5, mixup_config=None,
                                      label_smoothing=0.0, ema_decay=0.99)
    ev = make_supervised_eval_step(model)
    return model, state, step, ev


def test_loop_logs_checkpoints_and_resumes(tmp_path):
    loader = FakeLoader(3, 4, 16, 5)
    save_dir = str(tmp_path / "run")
    _, state, step, ev = make_everything()
    state = run_training(
        state=state, train_step=step, train_loader=loader, epochs=2,
        rng=jax.random.PRNGKey(1), eval_step=ev, eval_loader=loader,
        save_dir=save_dir, ckpt_every=1, log_every=1)
    assert int(state.step) == 6
    assert os.path.exists(os.path.join(save_dir, "log.csv"))
    ckpts = os.listdir(os.path.join(save_dir, "ckpt"))
    assert any(c.startswith("step_") for c in ckpts)

    # crash-resume: a fresh state resumes from the saved checkpoint and
    # continues to epoch 3 (one extra epoch)
    _, state2, step2, ev2 = make_everything()
    state2 = run_training(
        state=state2, train_step=step2, train_loader=loader, epochs=3,
        rng=jax.random.PRNGKey(1), save_dir=save_dir, ckpt_every=1,
        resume=True)
    assert int(state2.step) == 9  # resumed at 6, ran 1 more epoch of 3
