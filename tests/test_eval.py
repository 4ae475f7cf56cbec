"""Evaluation harness tests with synthetic images and fake embedders."""

import os

import numpy as np
import pytest

from loongx_tpu.evaluation import (
    eval_distance, cosine_matrix_mean, pair_generated_gt, evaluate_directory,
)


@pytest.fixture()
def eval_dir(tmp_path):
    from PIL import Image

    rng = np.random.RandomState(0)
    for i in range(3):
        base = rng.randint(0, 255, (32, 32, 3), np.uint8)
        Image.fromarray(base).save(tmp_path / f"img{i}_0.png")
        # gt = slightly shifted version
        gt = np.clip(base.astype(int) + 10, 0, 255).astype(np.uint8)
        Image.fromarray(gt).save(tmp_path / f"img{i}_1.png")
    # an unmatched generated file
    Image.fromarray(rng.randint(0, 255, (32, 32, 3), np.uint8)).save(
        tmp_path / "orphan_0.png"
    )
    return str(tmp_path)


class TestPairing:
    def test_pairs_by_suffix(self, eval_dir):
        pairs = pair_generated_gt(eval_dir)
        assert len(pairs) == 3
        for g, t in pairs:
            assert g.endswith("_0.png") and t.endswith("_1.png")


class TestDistances:
    def test_l1_l2_known_values(self, eval_dir):
        pairs = pair_generated_gt(eval_dir)
        l1 = eval_distance(pairs, "l1", size=32)
        l2 = eval_distance(pairs, "l2", size=32)
        # constant +10/255 shift -> l1 ~ 10/255 (clipping makes it slightly less)
        assert 0.02 < l1 < 0.05
        assert 0.0005 < l2 < 0.01
        assert l2 < l1

    def test_identical_images_zero(self, tmp_path):
        from PIL import Image

        img = np.zeros((16, 16, 3), np.uint8)
        Image.fromarray(img).save(tmp_path / "a_0.png")
        Image.fromarray(img).save(tmp_path / "a_1.png")
        pairs = pair_generated_gt(str(tmp_path))
        assert eval_distance(pairs, "l1", 16) == 0.0


class TestCosine:
    def test_cosine_identity(self):
        a = np.random.RandomState(0).randn(4, 8)
        sims = cosine_matrix_mean(a, a)
        np.testing.assert_allclose(sims, 1.0, atol=1e-6)

    def test_cosine_orthogonal(self):
        a = np.array([[1.0, 0.0]])
        b = np.array([[0.0, 1.0]])
        np.testing.assert_allclose(cosine_matrix_mean(a, b), 0.0, atol=1e-12)


class TestEvaluateDirectory:
    def test_full_run_with_fake_embedders(self, eval_dir, tmp_path):
        rng = np.random.RandomState(1)

        def fake_img_embed(paths):
            # deterministic per-file embedding
            return np.stack([
                np.frombuffer(
                    os.path.basename(p).encode().ljust(16, b"x")[:16], np.uint8
                ).astype(np.float64)
                for p in paths
            ])

        def fake_text_embed(texts):
            return rng.randn(len(texts), 16)

        out_dir = str(tmp_path / "results")
        results = evaluate_directory(
            eval_dir,
            instructions={f"img{i}": f"instr {i}" for i in range(3)},
            clip_image_embed=fake_img_embed,
            clip_text_embed=fake_text_embed,
            dino_image_embed=fake_img_embed,
            out_dir=out_dir,
            image_size=32,
        )
        for key in ("l1", "l2", "clip_i", "dino_i", "clip_t_gen", "clip_t_gt"):
            assert key in results and np.isfinite(results[key])
        assert os.path.exists(os.path.join(out_dir, "evaluation_metrics.txt"))
        csv_path = os.path.join(out_dir, "per_image_metrics.csv")
        assert os.path.exists(csv_path)
        with open(csv_path) as f:
            lines = f.read().strip().splitlines()
        assert len(lines) == 4  # header + 3 rows

    def test_empty_dir_raises(self, tmp_path):
        with pytest.raises(ValueError):
            evaluate_directory(str(tmp_path))
