"""Class-based Trainer facade.

The reference *intended* a class-based trainer — `Diffusion/Trainer.py:25-72`
is an unfinished `Trainer` whose methods are all `pass`, duplicated next to
the functional `Train.py` (SURVEY §1). This is that class, implemented: a
thin, stateful wrapper over the functional pipelines so notebook/interactive
use gets `trainer.fit() / .sample() / .search() / .save() / .load()`.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core import sample as core_sample
from ..utils import Config
from .checkpoint import restore_checkpoint, save_checkpoint


class Trainer:
    def __init__(self, cfg: Config):
        from ..cli import runner  # late import: runner pulls most subsystems
        self.cfg = cfg
        self._runner = runner
        self.model, self.conditional = runner.build_model(cfg)
        self.state = None

    # -- training ----------------------------------------------------------

    def fit(self, max_steps: Optional[int] = None) -> dict:
        out = self._runner.train(self.cfg, max_steps=max_steps)
        self.state = out["state"]
        return out

    def finetune_extended_T(self, max_steps: Optional[int] = None) -> dict:
        out = self._runner.finetune_extended_T(self.cfg, max_steps=max_steps)
        self.state = out["state"]
        return out

    # -- inference ---------------------------------------------------------

    @property
    def params(self):
        assert self.state is not None, "no params: fit() or load() first"
        if getattr(self.state, "ema_params", None) is not None:
            return self.state.ema_params
        return self.state.params

    def sample(self, n: int, key: Optional[jax.Array] = None,
               labels=None) -> np.ndarray:
        cfg = self.cfg
        key = key if key is not None else jax.random.PRNGKey(cfg.seed)
        sched = self._runner.build_schedule(cfg, inference=True)
        kx, ks = jax.random.split(key)
        x_T = jax.random.normal(kx, (n, cfg.data.img_size,
                                     cfg.data.img_size, 3))
        if self.conditional:
            if labels is None:
                labels = (jnp.arange(n) % cfg.model.num_labels) + 1
            eps_fn = self._runner.make_eps_fn(
                self.model, self.params, True, jnp.asarray(labels),
                cfg.diffusion.w, cfg_interval=cfg.diffusion.cfg_interval)
        else:
            eps_fn = self._runner.make_eps_fn(self.model, self.params, False)
        # dispatch through run_sampler so cfg.diffusion.sampler
        # (ddpm/ddim/dpm/picard) is honoured, same as the CLI paths
        return np.asarray(
            self._runner.run_sampler(cfg, sched, eps_fn, x_T, ks))

    def search(self, verifier_fn=None) -> dict:
        return self._runner.run_search(self.cfg, params=self.params,
                                       verifier_fn=verifier_fn)

    def evaluate(self) -> dict:
        return self._runner.evaluate(self.cfg, params=self.params)

    # -- checkpointing -----------------------------------------------------

    def save(self, name: str = "ckpt") -> str:
        assert self.state is not None
        path = os.path.join(self.cfg.save_weight_dir, name)
        save_checkpoint(path, jax.device_get(self.state))
        return path

    def load(self, name: str) -> None:
        path = os.path.join(self.cfg.save_weight_dir, name)
        try:
            self.state = restore_checkpoint(path)
        except (KeyError, TypeError):
            # A params-only checkpoint (e.g. save_params output from
            # finetune-t) restores as a bare pytree, so the TrainState
            # field access raises KeyError/TypeError — wrap it in a
            # params-only state, mirroring runner.load_eval_params. Any
            # other failure (missing path, corrupt/partial full
            # checkpoint) propagates with its real cause.
            from ..cli.runner import init_params
            from .checkpoint import restore_params
            from .loop import TrainState

            params = restore_params(path, template=init_params(
                self.cfg, self.model, self.conditional))
            self.state = TrainState(step=jnp.zeros((), jnp.int32),
                                    params=params, opt_state=None,
                                    ema_params=None)
