"""Pixel losses for inverse rendering (BASELINE config 4).

The reference has no differentiability at all (Rust/WGSL forward renderer
only); this subsystem is the "beyond parity" capability demanded by
BASELINE.json: scene-parameter gradients (sphere centers/radii, material
albedo/fuzz/IOR, camera) through the full wavefront render.

Gradients flow through `wavefront.render` via:
- reparameterized counter-based RNG (the same sample sequence is replayed
  under differentiation, so `grad` differentiates the sampled path);
- smooth transport terms (hit distance, normals, attenuations) with
  piecewise-constant discrete structure (argmin sphere choice, hit masks,
  reflect/refract branch) — gradients are exact almost everywhere and
  match finite differences for interior pixels; silhouette/visibility
  gradients are out of scope (SURVEY.md §7 "hard parts").
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from bevy_raytrace_tpu.wavefront.render import render


def image_l2_loss(img, target):
    """Mean squared error over pixels/channels.

    NOTE for optimization: with a *stochastic* renderer this plain L2 is a
    biased objective — E||r - t||^2 = ||E r - t||^2 + Var[r], and its
    gradient contains a dVar/dtheta term that can dominate at low spp and
    push geometry toward variance reduction instead of image match.  Use
    `render_loss` (two-sample cross estimator) for optimization.
    """
    diff = img - target
    return jnp.mean(diff * diff)


def render_loss(scene, camera, config, target, frame=0, render_fn=None):
    """Unbiased pixel L2 via the two-sample cross estimator.

    Renders twice with independent sample sets A and B (decorrelated
    frames) and returns  mean((r_A - t) * (r_B - t)),  whose expectation is
    ||E r - t||^2 exactly (the Var[r] term cancels because A and B are
    independent), and whose autodiff gradient
    E[dr_A (r_B - t) + (r_A - t) dr_B] = 2 (E r - t) dE r  is the unbiased
    gradient of the true objective.  This is what makes low-spp inverse
    rendering (BASELINE config 4) converge.

    `render_fn(scene, camera, config, frame) -> image` swaps the renderer
    (default: the XLA wavefront); pass the residual-replay fast path via
    `inverse.fast_grad.make_fast_renderer` for a Pallas forward + replay
    backward.
    """
    if render_fn is None:
        render_fn = render
    frame_a = (
        np.uint32(2) * np.uint32(frame)
        if isinstance(frame, int)
        else 2 * frame
    )
    img_a = render_fn(scene, camera, config, frame_a)
    img_b = render_fn(scene, camera, config, frame_a + 1)
    return jnp.mean((img_a - target) * (img_b - target))
