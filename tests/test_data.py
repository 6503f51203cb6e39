"""Data pipeline tests: datasets, augmentations, bucketed loaders,
decode-error resilience (SURVEY.md §2.4)."""

import random

import numpy as np
import pytest
from PIL import Image

from arbitrarystyletransfer_tpu.data import pipeline as dp


@pytest.fixture(scope="module")
def image_dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp("imgs")
    content = root / "content"
    style = root / "style"
    content.mkdir()
    style.mkdir()
    rng = np.random.default_rng(0)
    for d, n in ((content, 6), (style, 5)):
        for i in range(n):
            arr = (rng.uniform(0, 1, (40 + i, 50, 3)) * 255).astype(np.uint8)
            Image.fromarray(arr).save(d / f"img_{i}.png")
    # A corrupt file to exercise the decode-error retry loop.
    (content / "broken.jpg").write_bytes(b"not an image")
    return [str(content)], [str(style)]


class TestDatasets:
    def test_paired_sampling_and_len(self, image_dirs):
        content_dirs, style_dirs = image_dirs
        ds = dp.FlatFolderDataset(content_dirs, style_dirs, seed=0)
        # Reference __len__ quirk: content + style counts.
        assert len(ds) == 7 + 5  # includes the corrupt file in the listing
        r = random.Random(0)
        c, s = ds.sample_pair(r)
        assert c.ndim == 3 and c.shape[-1] == 3
        assert c.dtype == np.float32 and 0 <= c.min() and c.max() <= 1

    def test_decode_error_retry(self, image_dirs):
        content_dirs, _ = image_dirs
        ds = dp.FlatFolderDatasetAE(content_dirs, seed=0)
        r = random.Random(0)
        # 50 draws must all succeed despite the corrupt file being listed.
        for _ in range(50):
            img = ds.sample(r)
            assert img.shape[-1] == 3


class TestTransforms:
    def test_train_transform_output_shape(self):
        r = random.Random(0)
        x = np.random.default_rng(0).uniform(0, 1, (70, 90, 3)).astype(np.float32)
        out = dp.train_transform(x, r, (96, 128))
        assert out.shape == (96, 128, 3)
        assert out.dtype == np.float32

    def test_eval_transform(self):
        x = np.random.default_rng(0).uniform(0, 1, (30, 40, 3)).astype(np.float32)
        out = dp.eval_transform(x, (64, 64))
        assert out.shape == (64, 64, 3)

    def test_color_jitter_stays_in_range(self):
        r = random.Random(3)
        x = np.random.default_rng(1).uniform(0, 1, (16, 16, 3)).astype(np.float32)
        for _ in range(20):
            y = dp.color_jitter(x, r, p=1.0)
            assert y.min() >= -1e-6 and y.max() <= 1 + 1e-6

    def test_conditional_resize_only_upscales(self):
        x = np.zeros((10, 20, 3), np.float32)
        y = dp.conditional_resize(x, 16)
        assert min(y.shape[:2]) >= 16
        z = np.zeros((32, 32, 3), np.float32)
        assert dp.conditional_resize(z, 16).shape == (32, 32, 3)

    def test_random_resized_crop_shape(self):
        r = random.Random(0)
        x = np.random.default_rng(0).uniform(0, 1, (50, 60, 3)).astype(np.float32)
        out = dp.random_resized_crop(x, r, (32, 48))
        assert out.shape == (32, 48, 3)


class TestLoaders:
    def test_paired_loader_bucketed_batches(self, image_dirs):
        content_dirs, style_dirs = image_dirs
        ds = dp.FlatFolderDataset(content_dirs, style_dirs, seed=0)
        loader = dp.PairedBatchLoader(
            ds, batch_size=4, img_sizes=(32, 48), num_workers=2, seed=0
        )
        try:
            sizes = set()
            for _ in range(6):
                c, s = next(loader)
                assert c.shape[0] == 4 and s.shape[0] == 4
                assert c.shape == s.shape  # content/style share the bucket
                assert c.shape[1] in (32, 48) and c.shape[2] in (32, 48)
                sizes.add(c.shape[1:3])
            assert len(sizes) >= 1
        finally:
            loader.close()

    def test_content_loader_fixed_size(self, image_dirs):
        content_dirs, _ = image_dirs
        ds = dp.FlatFolderDatasetAE(content_dirs, seed=0)
        loader = dp.ContentBatchLoader(
            ds, batch_size=3, imsize=64, num_workers=1, seed=0
        )
        try:
            b = next(loader)
            assert b.shape == (3, 64, 64, 3)
        finally:
            loader.close()

    def test_image_loader(self, image_dirs):
        content_dirs, _ = image_dirs
        import pathlib

        some_img = next(
            p for p in pathlib.Path(content_dirs[0]).glob("*.png")
        )
        out = dp.image_loader(str(some_img), 48)
        assert out.shape == (1, 48, 48, 3)


def test_process_worker_loader(image_dirs):
    """Process-mode loader (forkserver workers) produces valid batches and
    shuts down cleanly — the training default (see pipeline.py's measured
    thread-vs-process numbers)."""
    import numpy as np

    from arbitrarystyletransfer_tpu.data.pipeline import (
        FlatFolderDataset,
        PairedBatchLoader,
    )

    content_dirs, style_dirs = image_dirs
    loader = PairedBatchLoader(
        FlatFolderDataset(content_dirs, style_dirs),
        batch_size=2,
        img_sizes=(32,),
        num_workers=1,
        prefetch=2,
        seed=0,
        worker_mode="process",
    )
    try:
        c, s = next(iter(loader))
        assert c.shape == (2, 32, 32, 3) and s.shape == (2, 32, 32, 3)
        assert c.dtype == np.float32
        assert 0.0 <= float(c.min()) and float(c.max()) <= 1.0
    finally:
        loader.close()
