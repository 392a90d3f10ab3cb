"""Differentiable rotated (z-yaw) 3D box IoU — pure JAX, fully batched.

Replaces the reference's ``model/rotated_iou/`` stack *including* its
``sort_vertices`` CUDA extension (``cuda_op/sort_vert_kernel.cu``): the sort
of <=24 candidate polygon vertices becomes a masked argsort-by-angle, which
XLA vectorizes on the VPU — no custom kernel needed on TPU
(SURVEY.md §2.8/§2.17).

Algorithm (semantics match ``oriented_iou_loss.py`` / ``box_intersection_2d.py``):
  1. 2D rectangle corners from (x, y, w, h, theta).
  2. 16 edge-pair intersection candidates + 8 corner-inside candidates,
     each with a validity mask (24 candidates total).
  3. Sort valid candidates CCW around their centroid; shoelace area.
  4. 3D IoU = 2D intersection area x z-overlap over union of volumes.

All functions broadcast over arbitrary leading batch dims. Gradients flow
through vertex coordinates (sorting indices are non-differentiable, exactly
like the reference's CUDA path).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

EPS = 1e-8


def box2corners(box: jnp.ndarray) -> jnp.ndarray:
    """(..., 5) [x, y, w, h, alpha] -> (..., 4, 2) CCW corners.

    Corner order matches oriented_iou_loss.py:box2corners_th (x4/y4 tables).
    """
    x, y, w, h, alpha = jnp.moveaxis(box, -1, 0)
    xs = jnp.stack([0.5 * w, -0.5 * w, -0.5 * w, 0.5 * w], axis=-1)
    ys = jnp.stack([0.5 * h, 0.5 * h, -0.5 * h, -0.5 * h], axis=-1)
    c, s = jnp.cos(alpha)[..., None], jnp.sin(alpha)[..., None]
    rx = xs * c - ys * s
    ry = xs * s + ys * c
    corners = jnp.stack([rx, ry], axis=-1)
    return corners + jnp.stack([x, y], axis=-1)[..., None, :]


def _edge_intersections(corners1, corners2):
    """All 4x4 edge-pair intersections. Returns (..., 16, 2) points and
    (..., 16) validity. Collinear edges yield no intersection."""
    nxt = jnp.array([1, 2, 3, 0])
    p1, q1 = corners1, corners1[..., nxt, :]
    p2, q2 = corners2, corners2[..., nxt, :]
    # pair every edge of box1 with every edge of box2
    x1, y1 = p1[..., :, None, 0], p1[..., :, None, 1]
    x2, y2 = q1[..., :, None, 0], q1[..., :, None, 1]
    x3, y3 = p2[..., None, :, 0], p2[..., None, :, 1]
    x4, y4 = q2[..., None, :, 0], q2[..., None, :, 1]

    num = (x1 - x2) * (y3 - y4) - (y1 - y2) * (x3 - x4)
    den_t = (x1 - x3) * (y3 - y4) - (y1 - y3) * (x3 - x4)
    den_u = (x1 - x2) * (y1 - y3) - (y1 - y2) * (x1 - x3)
    t = den_t / jnp.where(num == 0.0, 1.0, num)
    u = -den_u / jnp.where(num == 0.0, 1.0, num)
    parallel = num == 0.0
    mask = (~parallel) & (t > 0) & (t < 1) & (u > 0) & (u < 1)
    t_safe = den_t / (num + EPS)
    ix = x1 + t_safe * (x2 - x1)
    iy = y1 + t_safe * (y2 - y1)
    pts = jnp.stack([ix, iy], axis=-1) * mask[..., None]
    shp = pts.shape[:-3] + (16, 2)
    return pts.reshape(shp), mask.reshape(shp[:-1])


def _corners_in_box(corners1, corners2):
    """(..., 4) bool: is corner i of box1 inside box2 (projection test,
    tolerant to on-edge points)."""
    a = corners2[..., 0:1, :]
    b = corners2[..., 1:2, :]
    d = corners2[..., 3:4, :]
    ab, ad = b - a, d - a
    am = corners1 - a
    p_ab = jnp.sum(ab * am, axis=-1)
    n_ab = jnp.sum(ab * ab, axis=-1)
    p_ad = jnp.sum(ad * am, axis=-1)
    n_ad = jnp.sum(ad * ad, axis=-1)
    r_ab = p_ab / jnp.maximum(n_ab, EPS)
    r_ad = p_ad / jnp.maximum(n_ad, EPS)
    # Tolerance must cover fp32 rounding of the rotated-corner
    # arithmetic: at coordinates ~100 the normalized projection of an
    # exactly-on-edge corner lands within ~1e-5 of {0, 1}, so 1e-6 made
    # on-boundary corners fail RANDOMLY by theta — for IDENTICAL boxes
    # this kept only half the polygon and returned self-IoU = 1/3
    # (5.5% of random boxes), putting a spurious barrier at the optimum
    # of the -log(IoU) OBB reg loss. 1e-4 of the edge length (~4e-3
    # voxel at room scale) is geometrically negligible.
    tol = 1e-4
    return (r_ab > -tol) & (r_ab < 1 + tol) & (r_ad > -tol) & (r_ad < 1 + tol)


def _polygon_area(vertices, mask):
    """Shoelace area of the CCW-sorted valid subset of 24 candidate vertices.

    This is the TPU replacement for the sort_vertices CUDA kernel: masked
    argsort by angle around the valid centroid, then a wraparound shoelace
    on zeroed-out invalid entries.
    """
    nv = jnp.sum(mask, axis=-1)
    maskf = mask.astype(vertices.dtype)[..., None]
    center = jnp.sum(vertices * maskf, axis=-2, keepdims=True) / jnp.maximum(
        nv[..., None, None], 1
    ).astype(vertices.dtype)
    v = (vertices - center) * maskf  # invalid -> exactly (0, 0)
    ang = jnp.arctan2(v[..., 1], v[..., 0])
    ang = jnp.where(mask, jax.lax.stop_gradient(ang), 1e9)
    order = jnp.argsort(ang, axis=-1)
    sv = jnp.take_along_axis(v, order[..., None], axis=-2)  # (..., 24, 2)
    # consecutive cross-products; zero padding kills pairs past nv-1
    cross = sv[..., :-1, 0] * sv[..., 1:, 1] - sv[..., :-1, 1] * sv[..., 1:, 0]
    total = jnp.sum(cross, axis=-1)
    # closing edge (last valid -> first)
    last_idx = jnp.maximum(nv - 1, 0)
    last = jnp.take_along_axis(sv, last_idx[..., None, None], axis=-2)[..., 0, :]
    first = sv[..., 0, :]
    total = total + (last[..., 0] * first[..., 1] - last[..., 1] * first[..., 0])
    area = jnp.abs(total) / 2.0
    return jnp.where(nv >= 3, area, 0.0)


def oriented_box_intersection_2d(corners1, corners2):
    """Intersection area of two rotated rectangles given (..., 4, 2) corners."""
    inters, m_inter = _edge_intersections(corners1, corners2)
    c12 = _corners_in_box(corners1, corners2)
    c21 = _corners_in_box(corners2, corners1)
    vertices = jnp.concatenate([corners1, corners2, inters], axis=-2)
    mask = jnp.concatenate([c12, c21, m_inter], axis=-1)
    return _polygon_area(vertices, mask)


def cal_iou(box1, box2):
    """2D rotated IoU for (..., 5) boxes. Returns (iou, corners1, corners2, union).

    Leading dims broadcast (e.g. ``(N,1,5)`` vs ``(1,M,5)`` -> ``(N,M)``).
    """
    shape = jnp.broadcast_shapes(box1.shape, box2.shape)
    box1 = jnp.broadcast_to(box1, shape)
    box2 = jnp.broadcast_to(box2, shape)
    corners1 = box2corners(box1)
    corners2 = box2corners(box2)
    inter = oriented_box_intersection_2d(corners1, corners2)
    area1 = box1[..., 2] * box1[..., 3]
    area2 = box2[..., 2] * box2[..., 3]
    # Convexity bound: the intersection of two convex regions can't
    # exceed either area. Degenerate candidates (near-parallel edges)
    # can otherwise emit far-away "intersection" vertices whose shoelace
    # area dwarfs the union — observed IoU 5e5 on early-training
    # proposals. Non-positive boxes get IoU 0.
    valid = (area1 > 0) & (area2 > 0)
    inter = jnp.clip(inter, 0.0, jnp.minimum(area1, area2))
    u = jnp.maximum(area1 + area2 - inter, EPS)
    iou = jnp.where(valid, inter / u, 0.0)
    return iou, corners1, corners2, u


def _split_3d(box3d):
    box2d = box3d[..., jnp.array([0, 1, 3, 4, 6])]
    zmin = box3d[..., 2] - box3d[..., 5] * 0.5
    zmax = box3d[..., 2] + box3d[..., 5] * 0.5
    return box2d, zmin, zmax


def cal_iou_3d(box3d1, box3d2, verbose: bool = False):
    """3D rotated IoU for (..., 7) [x,y,z,w,l,h,theta] boxes (z-yaw only).
    Semantics: oriented_iou_loss.py:cal_iou_3d."""
    box1, zmin1, zmax1 = _split_3d(box3d1)
    box2, zmin2, zmax2 = _split_3d(box3d2)
    z_overlap = jnp.clip(jnp.minimum(zmax1, zmax2) - jnp.maximum(zmin1, zmin2), min=0.0)
    iou_2d, c1, c2, u = cal_iou(box1, box2)
    inter_3d = iou_2d * u * z_overlap
    v1 = box3d1[..., 3] * box3d1[..., 4] * box3d1[..., 5]
    v2 = box3d2[..., 3] * box3d2[..., 4] * box3d2[..., 5]
    # same convexity bound as cal_iou (see there): keeps IoU in [0, 1]
    # for degenerate/garbage boxes instead of inter/EPS blow-ups
    valid = (v1 > 0) & (v2 > 0)
    inter_3d = jnp.clip(inter_3d, 0.0, jnp.minimum(v1, v2))
    u3d = jnp.maximum(v1 + v2 - inter_3d, EPS)
    iou3d = jnp.where(valid, inter_3d / u3d, 0.0)
    if verbose:
        z_range = jnp.clip(jnp.maximum(zmax1, zmax2) - jnp.minimum(zmin1, zmin2), min=0.0)
        return iou3d, c1, c2, z_range, u3d
    return iou3d


# --------------------------------------------------------------------------
# Enclosing boxes for GIoU / DIoU (oriented_iou_loss.py:enclosing_box)
# --------------------------------------------------------------------------

def enclosing_box_aligned(corners1, corners2):
    c = jnp.concatenate([corners1, corners2], axis=-2)
    w = jnp.max(c[..., 0], axis=-1) - jnp.min(c[..., 0], axis=-1)
    h = jnp.max(c[..., 1], axis=-1) - jnp.min(c[..., 1], axis=-1)
    return w, h


def enclosing_box_pca(corners1, corners2):
    c = jnp.concatenate([corners1, corners2], axis=-2)  # (..., 8, 2)
    c = c - jnp.mean(c, axis=-2, keepdims=True)
    cov = jnp.einsum("...ni,...nj->...ij", c, c,
                     precision=jax.lax.Precision.HIGHEST)
    a, b = cov[..., 0, 0], cov[..., 1, 1]
    cc = cov[..., 0, 1]
    # EPS floor: sqrt'(0) = inf would NaN the giou gradient at
    # degenerate (collinear) corner sets
    delta = jnp.sqrt(jnp.maximum(a * a + 4 * cc * cc - 2 * a * b + b * b, EPS))
    cc_safe = jnp.where(jnp.abs(cc) < EPS, EPS, cc)
    v1 = jnp.stack([(a - b - delta) / (2 * cc_safe), jnp.ones_like(a)], axis=-1)
    v2 = jnp.stack([(a - b + delta) / (2 * cc_safe), jnp.ones_like(a)], axis=-1)
    v1 = v1 / jnp.linalg.norm(v1, axis=-1, keepdims=True)
    v2 = v2 / jnp.linalg.norm(v2, axis=-1, keepdims=True)
    p1 = jnp.sum(c * v1[..., None, :], axis=-1)
    p2 = jnp.sum(c * v2[..., None, :], axis=-1)
    w = jnp.max(p1, axis=-1) - jnp.min(p1, axis=-1)
    h = jnp.max(p2, axis=-1) - jnp.min(p2, axis=-1)
    return w, h


def smallest_bounding_box(corners1, corners2):
    """Minimum-area enclosing rectangle of the 8 corner points.

    The optimum is collinear with a convex-hull edge (min_enclosing_box.py
    docstring); brute-force all 24 candidate point pairs as edge directions,
    fully vectorized instead of the reference's lookup-table gathers.
    """
    pts = jnp.concatenate([corners1, corners2], axis=-2)  # (..., 8, 2)
    ii, jj = jnp.triu_indices(8, k=1)
    skip = {(0, 2), (1, 3), (5, 7), (4, 6)}  # box diagonals can't be hull edges
    keep = [k for k in range(len(ii)) if (int(ii[k]), int(jj[k])) not in skip]
    ii, jj = ii[jnp.array(keep)], jj[jnp.array(keep)]  # 24 pairs
    a = pts[..., ii, :]  # (..., 24, 2)
    b = pts[..., jj, :]
    d = b - a
    norm = jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), EPS)
    u = d / norm                       # edge direction
    n = jnp.stack([-u[..., 1], u[..., 0]], axis=-1)  # normal
    rel = pts[..., None, :, :] - a[..., :, None, :]  # (..., 24, 8, 2)
    pu = jnp.sum(rel * u[..., :, None, :], axis=-1)  # projections along edge
    pn = jnp.sum(rel * n[..., :, None, :], axis=-1)
    w = jnp.max(pu, axis=-1) - jnp.min(pu, axis=-1)  # (..., 24)
    h = jnp.max(pn, axis=-1) - jnp.min(pn, axis=-1)
    areas = w * h
    # degenerate (coincident) candidate pairs -> +inf so never chosen
    degen = norm[..., 0] < 1e-6
    areas = jnp.where(degen, jnp.inf, areas)
    best = jnp.argmin(areas, axis=-1)
    w_best = jnp.take_along_axis(w, best[..., None], axis=-1)[..., 0]
    h_best = jnp.take_along_axis(h, best[..., None], axis=-1)[..., 0]
    return w_best, h_best


def enclosing_box(corners1, corners2, enclosing_type: str = "smallest"):
    if enclosing_type == "aligned":
        return enclosing_box_aligned(corners1, corners2)
    if enclosing_type == "pca":
        return enclosing_box_pca(corners1, corners2)
    if enclosing_type == "smallest":
        return smallest_bounding_box(corners1, corners2)
    raise ValueError(f"Unknown enclosing type: {enclosing_type}")


def cal_giou_3d(box3d1, box3d2, enclosing_type: str = "smallest"):
    """3D rotated GIoU loss. Returns (giou_loss, giou, iou3d)."""
    iou3d, c1, c2, z_range, u3d = cal_iou_3d(box3d1, box3d2, verbose=True)
    w, h = enclosing_box(c1, c2, enclosing_type)
    v_c = jnp.maximum(z_range * w * h, EPS)
    giou_loss = 1.0 - iou3d + (v_c - u3d) / v_c
    return giou_loss, 1.0 - giou_loss, iou3d


def cal_diou_3d(box3d1, box3d2, enclosing_type: str = "smallest"):
    """3D rotated DIoU loss. Returns (diou_loss, iou3d)."""
    iou3d, c1, c2, z_range, u3d = cal_iou_3d(box3d1, box3d2, verbose=True)
    w, h = enclosing_box(c1, c2, enclosing_type)
    d2 = jnp.sum((box3d1[..., 0:3] - box3d2[..., 0:3]) ** 2, axis=-1)
    c2_ = jnp.maximum(w * w + h * h + z_range * z_range, EPS)
    return 1.0 - iou3d + d2 / c2_, iou3d


def aabb2obb_3d(aabb: jnp.ndarray) -> jnp.ndarray:
    """AABB -> canonical OBB (w >= l, theta in {0, pi/2}).
    Semantics: oriented_iou_loss.py:aabb2obb_3d."""
    lo, hi = aabb[..., 0:3], aabb[..., 3:6]
    center = 0.5 * (lo + hi)
    whd = hi - lo
    w_t, l_t, h = whd[..., 0], whd[..., 1], whd[..., 2]
    rot = w_t < l_t
    w = jnp.where(rot, l_t, w_t)
    l = jnp.where(rot, w_t, l_t)
    theta = jnp.where(rot, jnp.pi / 2, 0.0)
    return jnp.concatenate(
        [center, jnp.stack([w, l, h, theta], axis=-1)], axis=-1
    )
