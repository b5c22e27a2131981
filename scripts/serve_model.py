"""Serve an exported StableHLO artifact over HTTP (stdlib only).

    python scripts/export_model.py --params <cfg> --weight <ckpt> \
        --what encode --out exports/encode.shlo
    python scripts/serve_model.py --artifact exports/encode.shlo --port 8787

Protocol (numpy .npz both ways — zero deps for clients beyond numpy):

    GET  /health            -> {"status": "ok", "meta": ..., "args": [...]}
    POST /predict           body: npz with arrays named arg0..argN
                            reply: npz with arrays named out0..outM

Client:

    import io, urllib.request, numpy as np
    buf = io.BytesIO(); np.savez(buf, arg0=imgs)
    req = urllib.request.Request("http://host:8787/predict",
                                 buf.getvalue(), method="POST")
    out = np.load(io.BytesIO(urllib.request.urlopen(req).read()))
    slots, masks = out["out0"], out["out1"]

The handler validates shapes/dtypes against the artifact header and runs
the compiled program on the server's backend (TPU under axon, CPU
elsewhere). Single-threaded by design: one TPU program, one queue —
concurrency belongs in a fleet of processes behind a load balancer, not
in this process.
"""

import argparse
import io
import json
import os
import sys
from http.server import BaseHTTPRequestHandler, HTTPServer

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def make_handler(call, header):
    expect = header["args"]

    class Handler(BaseHTTPRequestHandler):

        def log_message(self, fmt, *args):  # quiet; stdout is the app log
            pass

        def _reply(self, code, body, ctype="application/json"):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path != "/health":
                return self._reply(404, b'{"error": "not found"}')
            body = json.dumps({"status": "ok", "meta": header["meta"],
                               "platforms": header["platforms"],
                               "args": expect}).encode()
            self._reply(200, body)

        def do_POST(self):
            if self.path != "/predict":
                return self._reply(404, b'{"error": "not found"}')
            n = int(self.headers.get("Content-Length", 0))
            try:
                data = np.load(io.BytesIO(self.rfile.read(n)),
                               allow_pickle=False)
                args = []
                for i, spec in enumerate(expect):
                    a = data[f"arg{i}"]
                    if list(a.shape) != spec["shape"] or \
                            str(a.dtype) != spec["dtype"]:
                        raise ValueError(
                            f"arg{i}: got {a.shape}/{a.dtype}, artifact "
                            f"wants {spec['shape']}/{spec['dtype']}")
                    args.append(a)
            except (KeyError, ValueError, OSError) as e:
                return self._reply(
                    400, json.dumps({"error": str(e)}).encode())
            try:
                outs = call(*args)
            except Exception as e:  # execution-time failures (backend/
                # platform mismatch, OOM, ...) -> structured 500, not a
                # dropped connection (ADVICE r4)
                return self._reply(
                    500, json.dumps({"error": f"{type(e).__name__}: "
                                              f"{e}"}).encode())
            if not isinstance(outs, (tuple, list)):
                outs = (outs,)
            buf = io.BytesIO()
            np.savez(buf, **{f"out{i}": np.asarray(o)
                             for i, o in enumerate(outs)})
            self._reply(200, buf.getvalue(), "application/octet-stream")

    return Handler


def make_server(artifact, port=0, host="127.0.0.1"):
    """-> HTTPServer ready for serve_forever(); port 0 picks a free one."""
    from slotdiffusion_tpu.serving import load_artifact

    call, header = load_artifact(artifact)
    return HTTPServer((host, port), make_handler(call, header))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--artifact", required=True)
    parser.add_argument("--port", type=int, default=8787)
    parser.add_argument("--host", default="127.0.0.1")
    args = parser.parse_args()

    import jax

    srv = make_server(args.artifact, args.port, args.host)
    print(f"serving {args.artifact} on http://{args.host}:"
          f"{srv.server_port} (backend: {jax.default_backend()})")
    srv.serve_forever()


if __name__ == "__main__":
    main()
