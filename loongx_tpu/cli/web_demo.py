"""Zero-dependency web demo server (stdlib http.server).

The reference ships a gradio web demo (``src/gradio/gradio_app.py``); this
framework's ``cli/gradio_app.py`` mirrors it when gradio is installed.  On
hosts without gradio (this environment included) the demo could previously
never launch — this module serves the SAME editing core
(``gradio_app.process_image_and_text``: center-crop → subject condition →
few-step generate) through a stdlib HTTP server with a single-page UI, so
the web demo is runnable with no optional dependencies at all.
``cli/gradio_app.py`` falls back to this server automatically when gradio
is missing.

Protocol (also the programmatic API of the demo):
  GET  /        → HTML page (file picker + instruction box, fetch()-based)
  GET  /health  → {"status": "ok"}
  POST /edit    → request  {"image_b64": <base64 PNG/JPEG>, "text": str,
                            "num_steps": int?, "size": int?}
                  response {"image_b64": <base64 PNG>, "elapsed_s": float}
"""

from __future__ import annotations

import argparse
import base64
import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

_PAGE = """<!doctype html>
<html><head><meta charset="utf-8"><title>LoongX-TPU demo</title>
<style>
 body{font-family:sans-serif;max-width:720px;margin:2rem auto;padding:0 1rem}
 textarea{width:100%%;box-sizing:border-box}
 img{max-width:100%%;border:1px solid #ccc;margin-top:1rem}
 #status{color:#666}
</style></head>
<body>
<h2>LoongX-TPU &mdash; subject-driven generation</h2>
<p>Upload a subject image and describe the edit; the server runs the
conditioned FLUX pipeline (%(steps)d steps).</p>
<input type="file" id="img" accept="image/*"><br><br>
<textarea id="text" rows="2" placeholder="instruction"></textarea><br><br>
<button id="go">Generate</button> <span id="status"></span>
<div><img id="out" style="display:none"></div>
<script>
document.getElementById('go').onclick = async () => {
  const f = document.getElementById('img').files[0];
  const status = document.getElementById('status');
  if (!f) { status.textContent = 'pick an image first'; return; }
  const b64 = await new Promise((res) => {
    const r = new FileReader();
    r.onload = () => res(r.result.split(',')[1]);
    r.readAsDataURL(f);
  });
  status.textContent = 'generating…';
  const resp = await fetch('/edit', {
    method: 'POST', headers: {'Content-Type': 'application/json'},
    body: JSON.stringify({image_b64: b64,
                          text: document.getElementById('text').value}),
  });
  const data = await resp.json();
  if (!resp.ok) { status.textContent = 'error: ' + data.error; return; }
  const img = document.getElementById('out');
  img.src = 'data:image/png;base64,' + data.image_b64;
  img.style.display = 'block';
  status.textContent = data.elapsed_s.toFixed(2) + ' s';
};
</script>
</body></html>
"""


def build_server(editor, port: int = 0, num_steps: int = 8):
    """HTTP server around ``editor(image: PIL.Image, text: str) -> PIL.Image``.

    ``editor`` is injected so tests can drive the full HTTP surface without
    model weights; ``main`` wires the real pipeline through
    ``gradio_app.process_image_and_text``.  Returns a ThreadingHTTPServer
    (``.server_address[1]`` is the bound port when ``port=0``).
    """
    import binascii

    from PIL import Image, UnidentifiedImageError

    # one edit at a time: concurrent denoise loops on one chip would
    # double-allocate activations (HBM OOM at the 12B point) and race
    # adapter switching in generate(); gradio queues the same way
    edit_lock = threading.Lock()

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet by default
            pass

        def _json(self, code: int, obj) -> None:
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/health":
                self._json(200, {"status": "ok"})
                return
            body = (_PAGE % {"steps": num_steps}).encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/html; charset=utf-8")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_POST(self):
            if self.path != "/edit":
                self._json(404, {"error": "unknown endpoint"})
                return
            try:  # request parsing: malformed input is the client's fault
                n = int(self.headers.get("Content-Length", "0"))
                req = json.loads(self.rfile.read(n))
                img = Image.open(
                    io.BytesIO(base64.b64decode(req["image_b64"]))
                ).convert("RGB")
                text = str(req.get("text", ""))
            except (KeyError, ValueError, TypeError, binascii.Error,
                    UnidentifiedImageError) as e:
                self._json(400, {"error": f"{type(e).__name__}: {e}"})
                return
            try:  # model execution: failures here are server faults
                t0 = time.perf_counter()
                with edit_lock:
                    out = editor(img, text)
                elapsed = time.perf_counter() - t0
                buf = io.BytesIO()
                out.save(buf, format="PNG")
                self._json(200, {
                    "image_b64": base64.b64encode(buf.getvalue()).decode(),
                    "elapsed_s": elapsed,
                })
            except Exception as e:
                self._json(500, {"error": f"{type(e).__name__}: {e}"})

    return ThreadingHTTPServer(("127.0.0.1", port), Handler)


def serve_forever_in_thread(server) -> threading.Thread:
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    return t


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("--checkpoint", type=str, default=None,
                        help="converted checkpoint dir (utils/convert.py)")
    parser.add_argument("--tiny-random", action="store_true",
                        help="serve a random tiny pipeline (no weights; "
                        "smoke/demo mode — outputs are noise)")
    parser.add_argument("--steps", type=int, default=8)
    parser.add_argument("--size", type=int, default=512)
    parser.add_argument("--port", type=int, default=7860)
    args = parser.parse_args(argv)

    from loongx_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    import jax

    from loongx_tpu.cli.gradio_app import process_image_and_text
    from loongx_tpu.models.pipeline import LoongXPipeline

    if args.tiny_random:
        pipeline = LoongXPipeline.tiny(jax.random.key(0))
        size = 32
    elif args.checkpoint:
        pipeline = LoongXPipeline.from_pretrained(args.checkpoint)
        size = args.size
    else:
        parser.error("--checkpoint or --tiny-random required")

    def editor(image, text):
        kw = {}
        if args.tiny_random:
            # random tiny pipeline has no tokenizers — drive on zero embeds
            import jax.numpy as jnp

            kw = dict(
                prompt_embeds=jnp.zeros(
                    (1, 8, pipeline.flux_cfg.joint_dim)
                ),
                pooled_prompt_embeds=jnp.zeros(
                    (1, pipeline.flux_cfg.pooled_dim)
                ),
            )
            text = None
        return process_image_and_text(
            pipeline, image, text or "", num_steps=args.steps, size=size,
            attn_backend="auto" if not args.tiny_random else "xla", **kw
        )

    server = build_server(editor, port=args.port, num_steps=args.steps)
    print(f"serving on http://127.0.0.1:{server.server_address[1]}")
    server.serve_forever()


if __name__ == "__main__":
    main()
