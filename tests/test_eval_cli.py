"""End-to-end eval CLI self-consistency (VERDICT r1 Weak #7).

Drives the FULL quality-parity path from docs/EVALUATION.md with tiny
synthetic weights: a random HF CLIPModel checkpoint on disk ->
``cli/convert --eval_clip`` -> ``cli/evaluate --jax_clip_path`` over a real
gen/gt image directory -> aggregate metrics.  The same run through the HF
torch backend (``--clip_path``) must agree, proving the in-framework JAX
towers + conversion are interchangeable with the reference's CLIP scoring
stack (reference test.py:85-214).
"""

import json
import os
import string

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def hf_clip_dir(tmp_path_factory):
    """A complete tiny HF CLIP checkpoint: model + tokenizer + processor."""
    from transformers import CLIPConfig, CLIPModel, CLIPTokenizer

    d = str(tmp_path_factory.mktemp("hf_clip"))
    # --- tokenizer files (char-level BPE vocab, no merges) ---
    vocab = {"<|startoftext|>": 0, "<|endoftext|>": 1}
    for ch in string.ascii_lowercase + string.digits + " ":
        for tok in (ch, ch + "</w>"):
            if tok not in vocab:
                vocab[tok] = len(vocab)
    with open(os.path.join(d, "vocab.json"), "w") as f:
        json.dump(vocab, f)
    with open(os.path.join(d, "merges.txt"), "w") as f:
        f.write("#version: 0.2\n")
    tok = CLIPTokenizer(
        os.path.join(d, "vocab.json"), os.path.join(d, "merges.txt")
    )
    tok.save_pretrained(d)

    cfg = CLIPConfig(
        text_config={
            "vocab_size": len(vocab), "hidden_size": 32,
            "num_hidden_layers": 2, "num_attention_heads": 4,
            "intermediate_size": 64, "max_position_embeddings": 16,
            "eos_token_id": 1, "bos_token_id": 0, "pad_token_id": 1,
            "hidden_act": "quick_gelu",
        },
        vision_config={
            "image_size": 16, "patch_size": 8, "hidden_size": 32,
            "num_hidden_layers": 2, "num_attention_heads": 4,
            "intermediate_size": 64, "hidden_act": "quick_gelu",
        },
        projection_dim=16,
    )
    torch.manual_seed(0)
    CLIPModel(cfg).eval().save_pretrained(d, safe_serialization=True)

    with open(os.path.join(d, "preprocessor_config.json"), "w") as f:
        json.dump(
            {
                "image_processor_type": "CLIPImageProcessor",
                "do_resize": True, "size": {"shortest_edge": 16},
                "do_center_crop": True,
                "crop_size": {"height": 16, "width": 16},
                "do_rescale": True, "do_normalize": True,
                "image_mean": [0.48145466, 0.4578275, 0.40821073],
                "image_std": [0.26862954, 0.26130258, 0.27577711],
                "do_convert_rgb": True,
            },
            f,
        )
    return d


@pytest.fixture(scope="module")
def eval_dirs(tmp_path_factory):
    """gen/gt pairs (constant-color images so every backend's resize path
    produces identical pixels) + a captions jsonl."""
    from PIL import Image

    root = tmp_path_factory.mktemp("eval")
    gen, gt = root / "gen", root / "gt"
    gen.mkdir(), gt.mkdir()
    colors = {"red": (200, 30, 30), "blue": (30, 30, 200)}
    for stem, c in colors.items():
        Image.new("RGB", (16, 16), c).save(gen / f"{stem}_0.png")
        Image.new("RGB", (16, 16), tuple(v // 2 for v in c)).save(
            gt / f"{stem}_1.png"
        )
    cap = root / "caps.jsonl"
    with open(cap, "w") as f:
        for stem in colors:
            f.write(json.dumps({
                "source_image": f"{stem}_0.png",
                "instruction": f"a {stem} square",
            }) + "\n")
    return str(gen), str(gt), str(cap)


def test_eval_cli_jax_backend_end_to_end(hf_clip_dir, eval_dirs, tmp_path):
    from loongx_tpu.cli.convert import main as convert_main
    from loongx_tpu.cli.evaluate import main as evaluate_main

    gen, gt, cap = eval_dirs
    bundle = str(tmp_path / "eval_clip")
    convert_main(["--eval_clip", hf_clip_dir, "--out", bundle])
    assert os.path.exists(os.path.join(bundle, "eval_clip.pkl"))

    out_dir = str(tmp_path / "results")
    results = evaluate_main([
        "--gen_dir", gen, "--gt_dir", gt, "--caption_path", cap,
        "--jax_clip_path", bundle, "--out_dir", out_dir,
        "--image_size", "16",
    ])
    for key in ("l1", "l2", "clip_i", "clip_t_gen", "clip_t_gt"):
        assert key in results and np.isfinite(results[key]), (key, results)
    assert results["l1"] > 0  # gen != gt by construction
    assert -1.0 <= results["clip_i"] <= 1.0
    # artifacts written like the reference (test.py:321-336)
    assert os.path.exists(os.path.join(out_dir, "evaluation_metrics.txt"))
    assert os.path.exists(os.path.join(out_dir, "per_image_metrics.csv"))


class FakeTokenizer:
    def __init__(self, vocab_size, max_len):
        self.vocab_size = vocab_size
        self.max_len = max_len

    def __call__(self, prompts, padding=None, max_length=None,
                 truncation=None, return_tensors=None):
        max_length = max_length or self.max_len
        ids = np.zeros((len(prompts), max_length), np.int32)
        for i, p in enumerate(prompts):
            for j, ch in enumerate(p[:max_length]):
                ids[i, j] = (ord(ch) + j) % self.vocab_size

        class R:
            input_ids = ids

        return R()


def test_parity_runbook_tiny(hf_clip_dir, tmp_path, monkeypatch):
    """Drives the FULL quality-parity runbook (cli/parity.py) on tiny
    synthetic weights: stage the L-Mind test split -> sharded batch infer ->
    evaluate with the JAX CLIP towers -> compare against targets.  On a
    weights-host the identical command with real weights is the parity run
    against the reference's CLIP-I 0.6605 / CLIP-T 0.2588 (VERDICT r4 #5)."""
    import jax
    from PIL import Image

    from loongx_tpu.cli import parity as parity_cli
    from loongx_tpu.cli.convert import main as convert_main
    from loongx_tpu.models.pipeline import LoongXPipeline
    from loongx_tpu.utils.checkpoint import save_pipeline

    pipe = LoongXPipeline.tiny(jax.random.key(0))
    ckpt = str(tmp_path / "ckpt")
    save_pipeline(pipe, ckpt)
    # save_pipeline doesn't persist the fake tokenizers — reattach on load
    real_fp = LoongXPipeline.from_pretrained

    def fp(path, **kw):
        p = real_fp(path, **kw)
        p.t5_tokenizer = FakeTokenizer(p.t5_cfg.vocab_size, 8)
        p.clip_tokenizer = FakeTokenizer(p.clip_cfg.vocab_size, 8)
        p.max_sequence_length = 8
        return p

    monkeypatch.setattr(LoongXPipeline, "from_pretrained", staticmethod(fp))

    # L-Mind-layout test split: <stem>_0 source / <stem>_1 ground truth
    data = tmp_path / "data"
    (data / "imgs").mkdir(parents=True)
    rng = np.random.RandomState(0)
    rows = []
    for i in range(2):
        for tag in (0, 1):
            Image.fromarray(
                rng.randint(0, 255, (16, 16, 3), np.uint8)
            ).save(data / "imgs" / f"s{i}_{tag}.png")
        rows.append({"source_image": f"imgs/s{i}_0.png",
                     "target_image": f"imgs/s{i}_1.png",
                     "instruction": f"edit number {i}"})
    jsonl = str(data / "test.jsonl")
    with open(jsonl, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")

    bundle = str(tmp_path / "eval_clip")
    convert_main(["--eval_clip", hf_clip_dir, "--out", bundle])

    out = str(tmp_path / "parity")
    common = [
        "--checkpoint", ckpt,
        "--test_jsonl", jsonl,
        "--image_dir", str(data),
        "--jax_clip_path", bundle,
        "--out", out,
        "--mode", "neural_speech",
        "--steps", "1",
        "--target_size", "16",
    ]
    # tiny random weights can't hit quality targets — a wide tolerance
    # asserts the PLUMBING end to end; real runs keep the 0.005 default
    verdict = parity_cli.main(common + ["--tolerance", "2.0"])
    assert verdict["parity"] is True
    assert verdict["clip_i"]["pass"] and verdict["clip_t_gen"]["pass"]
    assert sorted(os.listdir(os.path.join(out, "outputs"))) == [
        "s0_0.png", "s1_0.png"
    ]
    assert os.path.exists(os.path.join(out, "parity.json"))
    assert os.path.exists(
        os.path.join(out, "eval", "evaluation_metrics.txt")
    )

    # re-evaluate an existing outputs dir + the FAIL branch: an impossible
    # target must exit non-zero
    with pytest.raises(SystemExit):
        parity_cli.main(common + [
            "--skip_generate", "--tolerance", "0.000001",
            "--target_clip_i", "9.9",
        ])


def test_eval_cli_jax_matches_torch_backend(hf_clip_dir, eval_dirs, tmp_path):
    """The in-framework towers and HF torch must score identically on
    resize-invariant images (same weights, same tokenizer)."""
    from loongx_tpu.cli.convert import main as convert_main
    from loongx_tpu.cli.evaluate import main as evaluate_main

    gen, gt, cap = eval_dirs
    bundle = str(tmp_path / "eval_clip")
    convert_main(["--eval_clip", hf_clip_dir, "--out", bundle])

    common = ["--gen_dir", gen, "--gt_dir", gt, "--caption_path", cap,
              "--image_size", "16"]
    r_jax = evaluate_main(common + ["--jax_clip_path", bundle])
    r_torch = evaluate_main(common + ["--clip_path", hf_clip_dir])
    for key in ("clip_i", "clip_t_gen", "clip_t_gt"):
        assert abs(r_jax[key] - r_torch[key]) < 2e-3, (
            key, r_jax[key], r_torch[key]
        )
