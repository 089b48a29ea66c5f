"""Gradient-based scene recovery (BASELINE config 4) with checkpoint/resume.

`optimize` recovers selected scene parameters (sphere centers/radii,
material albedo/fuzz/ior) from a target image by Adam on a pixel L2 loss,
re-sampling the Monte-Carlo noise every step (the `frame` counter advances,
so optimization is SGD over the sampling distribution rather than
overfitting one noise realization).

Checkpoint/resume: the reference persists nothing at all (SURVEY.md §5
"Checkpoint / resume: none"); here optimizer state + parameters + step
checkpoint to an .npz (host numpy, no framework lock-in) and training
resumes exactly.
"""

from __future__ import annotations

import dataclasses
import os
import pickle
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import optax

from bevy_raytrace_tpu.config import RenderConfig
from bevy_raytrace_tpu.core.types import Scene
from bevy_raytrace_tpu.inverse.loss import render_loss

# Leaves of Scene that may be optimized, addressed by short name.
_SCENE_LEAVES = {
    "centers": lambda s: s.centers,
    "radii": lambda s: s.radii,
    "albedo": lambda s: s.materials.albedo,
    "fuzz": lambda s: s.materials.fuzz,
    "ior": lambda s: s.materials.ior,
}


def _set_scene_params(scene: Scene, params: Dict[str, jnp.ndarray]) -> Scene:
    mats = scene.materials
    mats = dataclasses.replace(
        mats,
        albedo=params.get("albedo", mats.albedo),
        fuzz=params.get("fuzz", mats.fuzz),
        ior=params.get("ior", mats.ior),
    )
    return dataclasses.replace(
        scene,
        centers=params.get("centers", scene.centers),
        radii=params.get("radii", scene.radii),
        materials=mats,
    )


def _get_scene_params(scene: Scene, names: Sequence[str]) -> Dict[str, jnp.ndarray]:
    return {n: _SCENE_LEAVES[n](scene) for n in names}


@dataclasses.dataclass
class InverseProblem:
    """An inverse-rendering problem definition.

    `render_fn(scene, camera, config, frame) -> image` selects the
    renderer the loss differentiates through: None = the XLA wavefront;
    `inverse.fast_grad.make_fast_renderer` gives the Pallas forward +
    residual-replay backward fast path.
    """

    config: RenderConfig
    camera: object
    target: jnp.ndarray  # [H, W, 3] target image
    optimizable: Tuple[str, ...] = ("centers", "radii", "albedo")
    render_fn: Optional[Callable] = None

    def loss_fn(self, params, scene, frame):
        return render_loss(
            _set_scene_params(scene, params), self.camera, self.config,
            self.target, frame, render_fn=self.render_fn,
        )


@dataclasses.dataclass
class OptResult:
    scene: Scene
    losses: List[float]
    step: int


def save_checkpoint(path: str, step: int, params, opt_state) -> None:
    flat, treedef = jax.tree_util.tree_flatten((params, opt_state))
    np.savez(
        path,
        step=step,
        treedef=np.frombuffer(pickle.dumps(treedef), np.uint8),
        **{f"leaf_{i}": np.asarray(x) for i, x in enumerate(flat)},
    )


def load_checkpoint(path: str):
    with np.load(path, allow_pickle=False) as z:
        step = int(z["step"])
        treedef = pickle.loads(z["treedef"].tobytes())
        flat = [z[f"leaf_{i}"] for i in range(len(z.files) - 2)]
    params, opt_state = jax.tree_util.tree_unflatten(treedef, flat)
    return step, params, opt_state


def optimize(
    scene: Scene,
    problem: InverseProblem,
    steps: int = 200,
    learning_rate: float = 1e-2,
    optimizer: Optional[optax.GradientTransformation] = None,
    checkpoint_path: Optional[str] = None,
    checkpoint_every: int = 50,
    callback: Optional[Callable[[int, float], None]] = None,
) -> OptResult:
    """Run Adam on the selected scene parameters.

    Resumes from `checkpoint_path` if it exists.  Returns the optimized
    scene and the loss history of the steps run in this call.
    """
    opt = optimizer or optax.adam(learning_rate)
    params = _get_scene_params(scene, problem.optimizable)
    opt_state = opt.init(params)
    start_step = 0

    if checkpoint_path and os.path.exists(checkpoint_path):
        start_step, params, opt_state = load_checkpoint(checkpoint_path)

    @jax.jit
    def update(params, opt_state, frame):
        loss, grads = jax.value_and_grad(problem.loss_fn)(params, scene, frame)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses: List[float] = []
    step = start_step
    for step in range(start_step, steps):
        # A fresh MC sample set per step: frame == step.
        params, opt_state, loss = update(params, opt_state, step)
        losses.append(float(loss))
        if callback:
            callback(step, losses[-1])
        if checkpoint_path and (step + 1) % checkpoint_every == 0:
            save_checkpoint(checkpoint_path, step + 1, params, opt_state)

    return OptResult(
        scene=_set_scene_params(scene, params), losses=losses, step=step + 1
    )
