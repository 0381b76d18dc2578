"""ROSE / OCTA-500 dataset loaders and the synthetic generator.

The reference repo ships no data code (datasets are request-gated downloads,
reference README.md:45-47); the trainer this framework supplies reads the
standard on-disk layouts:

ROSE (https://imed.nimte.ac.cn/dataofrose.html), e.g. ROSE-1 SVC:
    <root>/ROSE-1/SVC/{train,test}/img/*.png|tif
    <root>/ROSE-1/SVC/{train,test}/gt/*.png           (full vessel GT)
    <root>/ROSE-1/SVC/train/thin_gt | thick_gt        (centerline scribbles)

OCTA-500 (3M/6M projections):
    <root>/OCTA-500/OCTA_3M/{train,test}/img/*.bmp
    <root>/OCTA-500/OCTA_3M/{train,test}/gt/*.bmp

Images load host-side into pinned numpy batches (PIL if present, else a
minimal PNG/BMP reader); every further transform is jitted on device
(octave_tpu.data.preprocess). SyntheticOcta generates vessel-like phantoms so
every train/eval/bench path runs without the gated datasets.
"""
from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Iterator, List, Optional, Tuple

import numpy as np

_IMG_EXTS = (".png", ".tif", ".tiff", ".bmp", ".jpg", ".jpeg", ".gif")


def _load_image(path: str) -> np.ndarray:
    """Read an image file to a (h,w) or (h,w,c) uint8 array.

    Prefers the framework's native C++ decoder (octave_tpu/data/_native/
    loader.cpp — PNG/BMP/PGM, threaded); falls back to pillow/imageio."""
    from octave_tpu.data import native

    if native.available():
        try:
            return native.decode_image(path)
        except IOError:
            pass  # unsupported format (e.g. tiff) → python fallbacks
    try:
        from PIL import Image  # optional dep

        with Image.open(path) as im:
            return np.asarray(im)
    except ImportError:
        pass
    try:
        import imageio.v3 as iio  # optional dep

        return iio.imread(path)
    except ImportError:
        pass
    raise RuntimeError(
        f"No image reader available for {path}: the native loader couldn't "
        "decode it and pillow/imageio are not installed."
    )


def load_image_batch(paths, size) -> np.ndarray:
    """Decode a batch of files to (n, h, w) uint8 grayscale at `size`.

    Uses the threaded native loader when built; otherwise falls back to the
    per-file python decoders (`_load_image`) with the same grayscale
    (ITU-R 601 luma) and nearest-resize (src = floor(dst*in/out)) semantics
    as loader.cpp, so callers get identical pixels either way — never
    silent zeros (ADVICE r1, cli predict)."""
    from octave_tpu.data import native

    paths = list(paths)
    h, w = size
    if native.available():
        return native.load_batch(paths, size)
    out = np.empty((len(paths), h, w), np.uint8)
    for i, p in enumerate(paths):
        img = _load_image(p)
        if img.ndim == 3:
            rgb = img[..., :3].astype(np.uint32)
            img = ((299 * rgb[..., 0] + 587 * rgb[..., 1] + 114 * rgb[..., 2])
                   // 1000).astype(np.uint8)
        if img.shape != (h, w):
            sy = (np.arange(h, dtype=np.int64) * img.shape[0]) // h
            sx = (np.arange(w, dtype=np.int64) * img.shape[1]) // w
            img = img[sy[:, None], sx[None, :]]
        out[i] = img
    return out


def _list_images(d: str) -> List[str]:
    if not os.path.isdir(d):
        return []
    return sorted(
        os.path.join(d, f) for f in os.listdir(d) if f.lower().endswith(_IMG_EXTS)
    )


@dataclass
class Sample:
    image: np.ndarray  # (h, w) uint8
    scribble: np.ndarray  # (h, w) uint8 label map (0=unlabeled, 1=bg, 2=vessel)
    mask: np.ndarray  # (h, w) uint8 dense label (0=bg, 1=vessel)
    # optional second-head target for the dual-decoder (ParallelHead)
    # variants: the ROSE thin/capillary-branch scribbles
    scribble_c: Optional[np.ndarray] = None


def _binarize(a: np.ndarray) -> np.ndarray:
    if a.ndim == 3:
        a = a[..., 0]
    return (a > 127).astype(np.uint8)


def skeletonize_to_scribble(mask: np.ndarray, rng: np.random.Generator,
                            bg_fraction: float = 0.02) -> np.ndarray:
    """Centerline-style weak annotation from a dense mask: morphological
    thinning of the vessel map (scribble class 2) + a sparse random sample
    of background pixels (scribble class 1). Used when a dataset has no
    scribble directory and for the synthetic generator.
    """
    m = mask.astype(bool)
    try:
        from scipy.ndimage import binary_erosion, binary_opening

        # classic morphological skeleton: ∪_k erode^k(A) \ open(erode^k(A))
        skel = np.zeros_like(m)
        eroded = m
        while eroded.any():
            skel |= eroded & ~binary_opening(eroded)
            eroded = binary_erosion(eroded)
    except ImportError:
        skel = m
    scrib = np.zeros_like(mask, dtype=np.uint8)
    scrib[skel] = 2
    bg = (~m) & (rng.random(mask.shape) < bg_fraction)
    scrib[bg] = 1
    return scrib


class ImageFolderOcta:
    """Generic {img, gt[, scribble[, scribble_c]]} folder dataset."""

    def __init__(self, img_dir: str, gt_dir: str, scribble_dir: Optional[str] = None,
                 seed: int = 0, scribble_c_dir: Optional[str] = None):
        self.images = _list_images(img_dir)
        self.gts = _list_images(gt_dir)
        assert len(self.images) == len(self.gts) and self.images, (
            f"mismatched/empty dataset: {img_dir} ({len(self.images)}) vs "
            f"{gt_dir} ({len(self.gts)})"
        )
        self.scribbles = _list_images(scribble_dir) if scribble_dir else []
        self.scribbles_c = _list_images(scribble_c_dir) if scribble_c_dir else []
        self._rng = np.random.default_rng(seed)

    def __len__(self) -> int:
        return len(self.images)

    @staticmethod
    def _to_scribble(path: str, mask: np.ndarray) -> np.ndarray:
        s = _binarize(_load_image(path))
        scrib = np.zeros_like(mask, dtype=np.uint8)
        scrib[s.astype(bool)] = 2
        return scrib

    def __getitem__(self, i: int) -> Sample:
        img = _load_image(self.images[i])
        if img.ndim == 3:
            img = img[..., 0]
        mask = _binarize(_load_image(self.gts[i]))
        if self.scribbles:
            scrib = self._to_scribble(self.scribbles[i], mask)
        else:
            scrib = skeletonize_to_scribble(mask, self._rng)
        scrib_c = (
            self._to_scribble(self.scribbles_c[i], mask) if self.scribbles_c else None
        )
        return Sample(img.astype(np.uint8), scrib, mask, scribble_c=scrib_c)


def rose(root: str, subset: str = "ROSE-1/SVC", split: str = "train",
         dual: bool = False) -> ImageFolderOcta:
    """ROSE layout (reference README.md:45).

    Default (single-head): the centerline (`thin_gt`) annotations are the
    weak scribbles, matching the paper's weakly-supervised setup.
    `dual=True` (the ParallelHead dual-decoder variants, reference
    compose.py:233-527): head 0 — the deep decoder — targets the pixel-level
    `thick_gt` annotation, head 1 — the shallow high-res branch — targets
    the centerline `thin_gt` (the ROSE coarse-to-fine split)."""
    base = os.path.join(root, subset, split)
    thin = os.path.join(base, "thin_gt")
    thick = os.path.join(base, "thick_gt")
    if dual:
        return ImageFolderOcta(
            os.path.join(base, "img"),
            os.path.join(base, "gt"),
            thick if os.path.isdir(thick) else None,
            scribble_c_dir=thin if os.path.isdir(thin) else None,
        )
    return ImageFolderOcta(
        os.path.join(base, "img"),
        os.path.join(base, "gt"),
        thin if os.path.isdir(thin) else None,
    )


def octa500(root: str, fov: str = "3M", split: str = "train") -> ImageFolderOcta:
    """OCTA-500 layout (reference README.md:45)."""
    base = os.path.join(root, f"OCTA_{fov}", split)
    return ImageFolderOcta(os.path.join(base, "img"), os.path.join(base, "gt"))


class SyntheticOcta:
    """Vessel-phantom generator: random smooth curvilinear structures on a
    speckle background — shape/statistics proxy for en-face angiograms so the
    whole pipeline (incl. Dice/AUC eval) runs without the gated datasets."""

    def __init__(self, size: Tuple[int, int] = (304, 304), n: int = 64, seed: int = 0,
                 cache: bool = True):
        self.size = size
        self.n = n
        self.seed = seed
        self._cache: Optional[dict] = {} if cache else None

    def __len__(self) -> int:
        return self.n

    def __getitem__(self, i: int) -> Sample:
        if self._cache is not None and i in self._cache:
            return self._cache[i]
        s = self._generate(i)
        if self._cache is not None:
            self._cache[i] = s
        return s

    def _generate(self, i: int) -> Sample:
        h, w = self.size
        rng = np.random.default_rng(self.seed * 100003 + i)
        mask = np.zeros((h, w), np.uint8)
        yy, xx = np.mgrid[0:h, 0:w]
        for _ in range(rng.integers(6, 14)):
            # random quadratic vessel path
            x0, x1 = rng.uniform(0, w, 2)
            xm = rng.uniform(0, w)
            t = np.linspace(0, 1, max(h, w) * 2)
            px = (1 - t) ** 2 * x0 + 2 * (1 - t) * t * xm + t**2 * x1
            py = t * (h - 1)
            r = rng.uniform(1.0, 3.5)
            for cx, cy in zip(px[:: max(1, len(px) // 256)], py[:: max(1, len(py) // 256)]):
                d2 = (yy - cy) ** 2 + (xx - cx) ** 2
                mask[d2 <= r * r] = 1
        speckle = rng.gamma(2.0, 0.12, (h, w))
        img = np.clip(speckle + mask * rng.uniform(0.35, 0.6), 0, 1)
        img8 = (img * 255).astype(np.uint8)
        scrib = skeletonize_to_scribble(mask, rng)
        return Sample(img8, scrib, mask)


def batch_iterator(
    dataset,
    batch_size: int,
    shuffle: bool = True,
    seed: int = 0,
    drop_last: bool = True,
    epochs: Optional[int] = None,
) -> Iterator[dict]:
    """Host-side batching into contiguous numpy arrays (the device transform
    is octave_tpu.data.preprocess.prepare_batch)."""
    n = len(dataset)
    if drop_last and n < batch_size:
        # without this the epoch loop yields nothing and spins forever
        raise ValueError(
            f"batch_size {batch_size} > dataset size {n} with drop_last — "
            "the iterator would never yield a batch"
        )
    rng = np.random.default_rng(seed)
    epoch = 0
    while epochs is None or epoch < epochs:
        order = rng.permutation(n) if shuffle else np.arange(n)
        stop = n - (n % batch_size) if drop_last else n
        for s in range(0, stop, batch_size):
            idx = order[s : s + batch_size]
            samples = [dataset[int(i)] for i in idx]
            batch = {
                "image": np.stack([x.image for x in samples]),
                "scribble": np.stack([x.scribble for x in samples]),
                "mask": np.stack([x.mask for x in samples]),
            }
            if all(x.scribble_c is not None for x in samples):
                batch["scribble_c"] = np.stack([x.scribble_c for x in samples])
            yield batch
        epoch += 1
