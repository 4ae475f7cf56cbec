"""Gradio web demo: subject-driven generation.

Equivalent of the reference's ``src/gradio/gradio_app.py`` (center-crop to
512, subject condition, few-step schnell-style schedule).  The reference's
copy is stale against its own ``generate`` signature (SURVEY §2a row 14);
this one is wired to the current API.  Uses ``gradio`` when installed;
otherwise serves the same editing core through the zero-dependency stdlib
server in ``cli/web_demo.py``.  Needs a converted checkpoint directory.
"""

from __future__ import annotations

import argparse


def process_image_and_text(
    pipeline, image, text: str, num_steps: int = 8, size: int = 512,
    **generate_kwargs,
):
    """The demo's whole editing path, UI-free (testable headlessly): center
    crop to square, resize, subject condition, few-step generate
    (reference gradio_app.py:44-71)."""
    from PIL import Image

    from loongx_tpu.sampling import Condition, generate

    w, h = image.size
    s = min(w, h)
    image = image.crop(
        ((w - s) // 2, (h - s) // 2, (w + s) // 2, (h + s) // 2)
    ).resize((size, size))
    cond = Condition("subject", raw_img=image)
    out = generate(
        pipeline,
        prompt=text.strip(),
        conditions=[cond],
        height=size,
        width=size,
        num_inference_steps=num_steps,
        output_type="uint8",
        **generate_kwargs,
    )
    return Image.fromarray(out[0])


def build_app(pipeline, num_steps: int = 8):
    import gradio as gr

    return gr.Interface(
        fn=lambda image, text: process_image_and_text(
            pipeline, image, text, num_steps
        ),
        inputs=[gr.Image(type="pil"), gr.Textbox(lines=2)],
        outputs=gr.Image(type="pil"),
        title="LoongX-TPU subject-driven generation",
    )


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoint", type=str, required=True)
    parser.add_argument("--steps", type=int, default=8)
    parser.add_argument("--port", type=int, default=7860)
    args = parser.parse_args(argv)

    try:
        import gradio  # noqa: F401
    except ImportError:
        # same demo, stdlib server (cli/web_demo.py) — no optional deps
        print("gradio not installed — serving the built-in web UI instead")
        from loongx_tpu.cli.web_demo import main as web_main

        web_main([
            "--checkpoint", args.checkpoint,
            "--steps", str(args.steps), "--port", str(args.port),
        ])
        return

    from loongx_tpu.models.pipeline import LoongXPipeline
    from loongx_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    pipeline = LoongXPipeline.from_pretrained(args.checkpoint)
    build_app(pipeline, args.steps).launch(server_port=args.port)


if __name__ == "__main__":
    main()
