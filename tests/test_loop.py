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


def test_resume_truncates_relogged_epochs(tmp_path):
    """A row is logged before its epoch's checkpoint is written, so a
    crash between the two leaves a logged epoch whose state was lost.
    Resume re-runs that epoch; the log must not contain it twice."""
    import csv

    import optax

    from fastvim_tpu.train import TrainState

    def make_state():
        return TrainState.create({"w": jnp.zeros(())}, optax.sgd(0.0))

    def train_step(state, batch, rng):
        return state.apply_gradients(grads={"w": jnp.zeros(())}), {}

    loader = [{"x": np.zeros((2,), np.float32)}]
    save_dir = str(tmp_path / "crash")
    # ckpt_every=2 -> epochs 0,1,2 are logged but only epoch 1's
    # checkpoint (step 2) exists: epoch 2 is the "lost" epoch.
    run_training(state=make_state(), train_step=train_step,
                 train_loader=loader, epochs=3,
                 rng=jax.random.PRNGKey(0), save_dir=save_dir,
                 ckpt_every=2)
    state2 = run_training(state=make_state(), train_step=train_step,
                          train_loader=loader, epochs=4,
                          rng=jax.random.PRNGKey(0), save_dir=save_dir,
                          ckpt_every=2, resume=True)
    assert int(state2.step) == 4  # resumed at step 2, ran epochs 2,3
    with open(os.path.join(save_dir, "log.csv")) as f:
        epochs = [int(float(r["epoch"])) for r in csv.DictReader(f)]
    assert epochs == [0, 1, 2, 3]


def test_eval_metrics_weighted_by_batch_size(tmp_path):
    """A ragged final val batch must not skew the epoch metric: per-batch
    means are weighted by batch size (VERDICT r3 weak #3). Batches of
    size 4 (mean 0) and size 1 (mean 1): unweighted mean-of-means would
    report 0.5; the correct example-weighted value is 1/5."""
    import csv

    import optax

    from fastvim_tpu.train import TrainState

    params = {"w": jnp.zeros(())}
    state = TrainState.create(params, optax.sgd(0.0))

    def train_step(state, batch, rng):
        return state.apply_gradients(grads={"w": jnp.zeros(())}), {}

    def eval_step(params, batch):
        return {"m": jnp.mean(batch["x"])}

    train_loader = [{"x": np.zeros((2,), np.float32)}]
    eval_loader = [{"x": np.zeros((4,), np.float32)},
                   {"x": np.ones((1,), np.float32)}]
    save_dir = str(tmp_path / "ragged")
    run_training(
        state=state, train_step=train_step, train_loader=train_loader,
        epochs=1, rng=jax.random.PRNGKey(0), eval_step=eval_step,
        eval_loader=eval_loader, save_dir=save_dir, ckpt_every=10)
    with open(os.path.join(save_dir, "log.csv")) as f:
        rows = list(csv.DictReader(f))
    assert abs(float(rows[-1]["val_m"]) - 0.2) < 1e-6
