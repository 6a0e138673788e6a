"""Generate the vendored golden micro-fixtures (VERDICT r3 item 8).

Run ONCE on a machine with the oracle deps and commit the .npz:
  python tests/golden/generate_goldens.py

Oracles used per fixture (reference call sites in parentheses):
  * EDT + nearest indices: scipy.ndimage.distance_transform_edt
    (reference weight_br.py:132, 159; ours_skel_parse.py:517)
  * 26/6-connected components: scipy.ndimage.label with full/face
    structuring elements (reference uses cc3d.connected_components —
    unavailable here; scipy's labeling partitions identically, and the
    fixture stores the canonicalized partition, not raw label ids)
  * fill holes: scipy.ndimage.binary_fill_holes (reference util.py:73)
  * skeleton: OUR Lee-thinning output pinned as a REGRESSION golden.
    skimage.morphology.skeletonize_3d (reference ske_and_parse.py:83)
    is not installable in this environment, so reference-level
    skeleton parity stays anchored by the exact CASE073/CASE091
    branch counts (tests/test_demo_parity.py); this fixture locks the
    native implementation bit-for-bit round over round.
"""

import os

import numpy as np


def _blobs(rng, shape, p=0.3, smooth=1):
    """Random connected-ish binary volume."""
    v = rng.random(shape)
    from scipy import ndimage

    v = ndimage.uniform_filter(v, size=2 * smooth + 1)
    return (v > np.quantile(v, 1 - p)).astype(np.uint8)


def _canon_partition(labels):
    """Canonicalize a label field: relabel by first-occurrence order so
    oracle implementations with different id assignment compare equal."""
    flat = labels.ravel()
    out = np.zeros_like(flat)
    nxt = 1
    seen = {}
    nz = np.flatnonzero(flat)
    for i in nz:
        l = flat[i]
        if l not in seen:
            seen[l] = nxt
            nxt += 1
        out[i] = seen[l]
    return out.reshape(labels.shape)


def main():
    from scipy import ndimage

    here = os.path.dirname(os.path.abspath(__file__))
    rng = np.random.default_rng(20260819)
    fx = {}

    # --- EDT with indices (3 cases incl. anisotropy-free cube) ---
    for i, shape in enumerate([(16, 16, 16), (24, 12, 20), (32, 32, 8)]):
        m = _blobs(rng, shape, p=0.4)
        dist, (iz, iy, ix) = ndimage.distance_transform_edt(
            m, return_indices=True
        )
        fx[f"edt{i}_in"] = m
        fx[f"edt{i}_dist"] = dist.astype(np.float64)
        # nearest-zero indices are not unique under ties; store the
        # tie-insensitive check target instead: the distance implied
        # by the indices must equal dist, and the indexed voxel must
        # be background. Keep the oracle's indices for reference.
        fx[f"edt{i}_idx"] = np.stack([iz, iy, ix]).astype(np.int32)

    # --- connected components, 26 and 6 (canonical partitions) ---
    for i, shape in enumerate([(16, 16, 16), (20, 24, 12)]):
        m = _blobs(rng, shape, p=0.25, smooth=0)
        l26, _ = ndimage.label(m, structure=np.ones((3, 3, 3)))
        l6, _ = ndimage.label(m)
        fx[f"cc{i}_in"] = m
        fx[f"cc{i}_l26"] = _canon_partition(l26).astype(np.int32)
        fx[f"cc{i}_l6"] = _canon_partition(l6).astype(np.int32)

    # --- fill holes ---
    m = np.zeros((16, 16, 16), np.uint8)
    m[3:13, 3:13, 3:13] = 1
    m[6:10, 6:10, 6:10] = 0  # interior cavity
    m[0:2, 0:2, 0:2] = 1  # corner block (no hole)
    fx["fill0_in"] = m
    fx["fill0_out"] = ndimage.binary_fill_holes(m).astype(np.uint8)

    # --- skeleton regression pin (our native Lee thinning) ---
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(here)))
    from se_unet_airseg_tpu.post import skeletonize_3d as skeletonize

    tube = np.zeros((24, 20, 20), np.uint8)
    tube[2:22, 8:12, 8:12] = 1  # straight tube
    tube[10:14, 10:18, 8:12] = 1  # side branch -> Y topology
    fx["skel0_in"] = tube
    fx["skel0_out"] = skeletonize(tube).astype(np.uint8)

    out = os.path.join(here, "post_goldens.npz")
    np.savez_compressed(out, **fx)
    print(f"wrote {out}: {sorted(fx)}")


if __name__ == "__main__":
    main()
