"""Tiny CPU drive of the speech->edit end-to-end rehearsal harness
(benchmarks/speech_edit_rehearsal.py): wav -> Whisper transcribe -> Marian
translate -> staged T5/CLIP encode -> conditioned edit -> PNG.  The
full-scale run executes the identical plumbing at whisper-large +
FLUX.1-dev-12B geometry on the chip (VERDICT r4 #8)."""

import importlib
import os

import pytest

pytest.importorskip("transformers")
pytest.importorskip("tokenizers")
pytest.importorskip("safetensors")


def test_speech_edit_rehearsal_tiny(tmp_path, monkeypatch):
    monkeypatch.setenv("REHEARSAL_TINY", "1")
    monkeypatch.setenv("REHEARSAL_DIR", str(tmp_path))
    import benchmarks.speech_edit_rehearsal as ser
    import benchmarks.train_rehearsal as tr

    importlib.reload(tr)
    ser = importlib.reload(ser)
    report = ser.main()
    # the chain produced an instruction and an image through every stage
    assert report["transcribe_s"] > 0
    assert report["translate_s"] > 0
    assert report["text_encode_s"] > 0
    assert report["edit_s"] > 0
    assert report["edit_neural_s"] > 0
    assert os.path.exists(report["png"])
    assert report["utterance_to_image_warm_s"] == pytest.approx(
        report["transcribe_s"] + report["translate_s"]
        + report["text_encode_s"] + report["edit_s"], abs=1e-6
    )
