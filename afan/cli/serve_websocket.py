"""Websocket detection server — port of `Detection/infer_websocket.py`:
an asyncio websockets server on :8765 consuming raw HxWx3 RGB frames and
returning JSON detections ``[{"bbox": [x1,y1,x2,y2], "label": c,
"prob": p}, ...]`` (`infer_websocket.py:19-60`). The browser client lives
in ``webapp/`` (plain canvas capture — no WASM dependency, unlike the
reference's vendored opencv.js).
"""
from __future__ import annotations

import argparse
import asyncio
import json

import numpy as np

from ..utils.logging import Log
from .infer_detect import build_state, detect_image
from ..train.detect_loop import make_detect_fn


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("-c", "--checkpoint", default=None)
    p.add_argument("-b", "--backbone", default="resnet50")
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8765)
    p.add_argument("--frame_width", type=int, default=640)
    p.add_argument("--frame_height", type=int, default=480)
    p.add_argument("--image_min_side", type=float, default=600.0)
    p.add_argument("--image_max_side", type=float, default=1000.0)
    p.add_argument("-p", "--prob_thresh", type=float, default=0.6)
    args = p.parse_args(argv)
    Log.initialize()

    import websockets

    model, state, canvas_hw = build_state(args)
    detect_fn = make_detect_fn(model)
    h, w = args.frame_height, args.frame_width

    async def handler(ws):
        Log.i(f"client connected: {ws.remote_address}")
        async for message in ws:
            if isinstance(message, str):
                continue
            frame = np.frombuffer(message, np.uint8)
            if frame.size != h * w * 3:
                await ws.send(json.dumps(
                    {"error": f"expected {h}x{w}x3 raw RGB bytes"}))
                continue
            img = frame.reshape(h, w, 3).astype(np.float32) / 255.0
            dets = detect_image(detect_fn, state, canvas_hw, img,
                                args.image_min_side, args.image_max_side,
                                args.prob_thresh)
            await ws.send(json.dumps([
                {"bbox": [float(v) for v in box], "label": int(c),
                 "prob": float(prob)} for box, c, prob in dets]))

    async def serve():
        async with websockets.serve(handler, args.host, args.port,
                                    max_size=h * w * 3 + 1024):
            Log.i(f"serving on ws://{args.host}:{args.port}")
            await asyncio.Future()

    asyncio.run(serve())


if __name__ == "__main__":
    main()
