"""Sphere clustering for culled traversal (the TPU's answer to a BVH).

The reference scans every sphere for every ray ("The world isn't
partitioned in any way", `intersect.wgsl:132-143`).  A per-lane BVH walk
is hostile to the VPU (divergent pointer chasing), so this framework uses
a two-phase, tile-granular scheme instead:

  plan (host, once per scene topology):
      order spheres along a Morton curve of their (x, z) centers and chop
      into fixed-size clusters -> spatially coherent groups with a static
      membership (a permutation + pad mask).  Membership is static; the
      *bounds* are recomputed from live sphere positions inside the jitted
      step, so inverse-rendering updates stay correct without replanning.

  kernel (per ray-tile, per bounce):
      phase A tests the whole tile against each cluster's bounding sphere
      (alive lanes only) and compacts the ids of hit clusters into an SMEM
      worklist with predicated scalar writes; phase B walks only that
      worklist with a dynamic-trip-count fori_loop.  A tile does
      O(C + |worklist| * L) sphere tests instead of O(N).

Measured effect is scene/viewpoint dependent: tiles see a handful of
clusters (primary rays are coherent; secondary rays start from a tile's
own hit region), and dead-lane masking in phase A gives late-bounce tiles
a free early-out.
"""

from __future__ import annotations

import numpy as np

from bevy_raytrace_tpu.pytree import pytree_dataclass


def _morton2(x: np.ndarray, y: np.ndarray, bits: int = 16) -> np.ndarray:
    """Interleave two quantized coordinates into a Morton code."""

    def part(v):
        v = v.astype(np.uint64)
        v = (v | (v << 16)) & np.uint64(0x0000FFFF0000FFFF)
        v = (v | (v << 8)) & np.uint64(0x00FF00FF00FF00FF)
        v = (v | (v << 4)) & np.uint64(0x0F0F0F0F0F0F0F0F)
        v = (v | (v << 2)) & np.uint64(0x3333333333333333)
        v = (v | (v << 1)) & np.uint64(0x5555555555555555)
        return v

    return part(x) | (part(y) << np.uint64(1))


@pytree_dataclass(meta_fields=("cluster_size", "n_clusters"))
class ClusterPlan:
    """Static traversal plan: permutation + pad mask (+ sizes as meta)."""

    perm: np.ndarray  # [C*L] int32, indices into the scene (duplicated pad)
    member_mask: np.ndarray  # [C, L] float32, 1 = real member, 0 = pad
    prio: np.ndarray  # [K] int32, "priority" spheres (largest |r|): their
    # live hit t gives the per-lane nearest-t upper bound for culling
    cluster_size: int
    n_clusters: int


def cluster_scene(scene, cluster_size: int = 12, n_prio: int = 4
                  ) -> ClusterPlan:
    """Build a ClusterPlan from a *concrete* scene (host numpy).

    Spheres are sorted by the Morton code of their quantized (x, z)
    center (RTiOW scenes spread on the ground plane; y adds nothing) and
    chopped into groups of `cluster_size`.  The permutation is static;
    call again only when the scene topology (sphere count) changes.
    """
    centers = np.asarray(scene.centers)
    n = centers.shape[0]
    lo = centers.min(axis=0)
    hi = centers.max(axis=0)
    span = np.maximum(hi - lo, 1e-6)
    qx = np.clip((centers[:, 0] - lo[0]) / span[0] * 65535, 0, 65535)
    qz = np.clip((centers[:, 2] - lo[2]) / span[2] * 65535, 0, 65535)
    order = np.argsort(_morton2(qx.astype(np.uint32), qz.astype(np.uint32)))

    L = cluster_size
    C = -(-n // L)
    perm = np.empty(C * L, np.int32)
    mask = np.zeros((C, L), np.float32)
    perm[:n] = order
    mask.reshape(-1)[:n] = 1.0
    # pad slots repeat the last real sphere; the mask keeps them out of the
    # bounds, and the kernel's dud handling keeps them out of hits.
    perm[n:] = order[-1]
    radii = np.abs(np.asarray(scene.radii))
    prio = np.argsort(-radii, kind="stable")[: min(n_prio, n)].astype(np.int32)
    return ClusterPlan(
        perm=perm, member_mask=mask, prio=prio, cluster_size=L, n_clusters=C
    )


def cluster_bounds(centers, radii, plan: ClusterPlan):
    """Per-cluster bounding spheres from live (possibly traced) geometry.

    Returns (bcx, bcy, bcz, kq) each [C], where kq = |bc|^2 - br^2 is the
    expanded-quadratic constant the kernel's bound test uses.
    """
    import jax.numpy as jnp

    L, C = plan.cluster_size, plan.n_clusters
    c = jnp.asarray(centers)[plan.perm].reshape(C, L, 3)
    r = jnp.abs(jnp.asarray(radii)[plan.perm].reshape(C, L))
    m = jnp.asarray(plan.member_mask)  # [C, L]
    count = jnp.sum(m, axis=1, keepdims=True)
    bc = jnp.sum(c * m[:, :, None], axis=1) / count[:, :1]  # [C,3]
    d = jnp.sqrt(jnp.sum((c - bc[:, None, :]) ** 2, axis=-1)) + r  # [C,L]
    br = jnp.max(jnp.where(m > 0, d, -jnp.inf), axis=1) * 1.0001 + 1e-4
    kq = jnp.sum(bc * bc, axis=-1) - br * br
    return bc[:, 0], bc[:, 1], bc[:, 2], kq
