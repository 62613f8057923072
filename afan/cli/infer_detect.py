"""Detection inference — ports of `Detection/infer.py` (single image with
box drawing), `infer_all.py` (directory batch), and `infer_stream.py`
(cv2 VideoCapture loop with frame-skip period).

Images are preprocessed with the dataset resize rule
(`dataset/base.py:75-91`), run through the jitted clean detect path, and
detections above ``--prob_thresh`` are drawn with class/prob labels.
"""
from __future__ import annotations

import argparse
import os
import time
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.voc_det import VOC_CLASSES, compute_scale, resize_image
from ..models.frcnn import FRCNNConfig, FasterRCNN
from ..train.checkpoint import load_checkpoint, overlap_restore
from ..train.detect_loop import detection_tx, make_detect_fn
from ..train.loop import TrainState
from ..utils.logging import Log


def build_state(args, num_classes: int = 21):
    cfg = FRCNNConfig(backbone=args.backbone, num_classes=num_classes)
    model = FasterRCNN(cfg=cfg)
    # canonical fat canvas for inference
    h = int(-(-args.image_min_side // 16) * 16)
    w = int(-(-args.image_max_side // 16) * 16)
    dummy = jnp.zeros((1, h, w, 3), jnp.float32)
    gt = jnp.zeros((1, 1, 4)), jnp.zeros((1, 1), jnp.int32), \
        jnp.ones((1, 1), bool)
    variables = model.init({"params": jax.random.PRNGKey(0)}, dummy, *gt,
                           jax.random.PRNGKey(1), method=model.losses)
    tx = detection_tx(lambda c: 0.0)
    state = TrainState.create(variables, tx)
    if args.checkpoint:
        saved = load_checkpoint(args.checkpoint)
        params, frac = overlap_restore(state.params, saved["params"])
        state = state.replace(params=params)
        Log.i(f"loaded {frac:.1%} from {args.checkpoint}")
    return model, state, (h, w)


def preprocess_frame(img: np.ndarray, canvas_hw, min_side: float,
                     max_side: float) -> Tuple[np.ndarray, float]:
    """Resize-rule + paste onto the static canvas → (canvas, scale)."""
    h0, w0 = img.shape[:2]
    scale = compute_scale(w0, h0, min_side, max_side)
    resized = resize_image(img, scale)
    ch, cw = canvas_hw
    canvas = np.zeros((ch, cw, 3), np.float32)
    rh, rw = min(resized.shape[0], ch), min(resized.shape[1], cw)
    canvas[:rh, :rw] = resized[:rh, :rw]
    return canvas, scale


def detect_batch(detect_fn, state, canvases: np.ndarray,
                 scales: List[float], prob_thresh: float
                 ) -> List[List[Tuple[np.ndarray, int, float]]]:
    """Batched detect on pre-canvased frames → per-frame detection lists
    (boxes rescaled to each frame's original coordinates)."""
    boxes, probs, keep = detect_fn(state, jnp.asarray(canvases))
    boxes, probs, keep = map(np.asarray, (boxes, probs, keep))
    results = []
    for b, scale in enumerate(scales):
        out = []
        sel = np.nonzero(keep[b] & (probs[b] > prob_thresh))
        for p_idx, c in zip(*sel):
            out.append((boxes[b, p_idx, c] / scale, int(c),
                        float(probs[b, p_idx, c])))
        results.append(out)
    return results


def detect_image(detect_fn, state, canvas_hw, img: np.ndarray,
                 min_side: float, max_side: float, prob_thresh: float
                 ) -> List[Tuple[np.ndarray, int, float]]:
    """img: float32 [0,1] HWC → [(box_xyxy_in_orig_coords, class, prob)]."""
    canvas, scale = preprocess_frame(img, canvas_hw, min_side, max_side)
    return detect_batch(detect_fn, state, canvas[None], [scale],
                        prob_thresh)[0]


def draw(img: np.ndarray, detections, class_names=VOC_CLASSES) -> np.ndarray:
    import cv2
    vis = (img * 255).astype(np.uint8).copy()
    for box, c, p in detections:
        x1, y1, x2, y2 = box.astype(int)
        color = (int((c * 37) % 255), int((c * 91) % 255),
                 int((c * 151) % 255))
        cv2.rectangle(vis, (x1, y1), (x2, y2), color, 2)
        name = class_names[c - 1] if 0 < c <= len(class_names) else str(c)
        cv2.putText(vis, f"{name} {p:.2f}", (x1, max(y1 - 4, 10)),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.5, color, 1)
    return vis


def main(argv=None):
    p = argparse.ArgumentParser(description="A-FAN TPU detection inference")
    p.add_argument("mode", choices=["image", "dir", "stream"])
    p.add_argument("input", help="image path / directory / camera index")
    p.add_argument("output", nargs="?", default="out.png")
    p.add_argument("-c", "--checkpoint", default=None)
    p.add_argument("-b", "--backbone", default="resnet50")
    p.add_argument("--image_min_side", type=float, default=600.0)
    p.add_argument("--image_max_side", type=float, default=1000.0)
    p.add_argument("-p", "--prob_thresh", "--probability_threshold",
                   type=float, default=0.6, dest="prob_thresh")
    p.add_argument("--period", type=int, default=3,
                   help="stream frame-skip period (infer_stream.py)")
    args = p.parse_args(argv)
    Log.initialize()

    model, state, canvas_hw = build_state(args)
    detect_fn = make_detect_fn(model)

    def run_one(path, out_path):
        from PIL import Image
        img = np.asarray(Image.open(path).convert("RGB"),
                         np.float32) / 255.0
        t0 = time.time()
        dets = detect_image(detect_fn, state, canvas_hw, img,
                            args.image_min_side, args.image_max_side,
                            args.prob_thresh)
        Log.i(f"{path}: {len(dets)} detections in {time.time() - t0:.2f}s")
        vis = draw(img, dets)
        import cv2
        cv2.imwrite(out_path, cv2.cvtColor(vis, cv2.COLOR_RGB2BGR))
        Log.i(f"wrote {out_path}")

    if args.mode == "image":
        run_one(args.input, args.output)
    elif args.mode == "dir":
        os.makedirs(args.output, exist_ok=True)
        for f in sorted(os.listdir(args.input)):
            if f.lower().endswith((".jpg", ".jpeg", ".png")):
                run_one(os.path.join(args.input, f),
                        os.path.join(args.output, f))
    else:  # stream (`infer_stream.py:19-60`)
        import cv2
        cap = cv2.VideoCapture(int(args.input) if args.input.isdigit()
                               else args.input)
        frame_idx = 0
        while cap.isOpened():
            ok, frame = cap.read()
            if not ok:
                break
            if frame_idx % args.period == 0:
                img = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB).astype(
                    np.float32) / 255.0
                dets = detect_image(detect_fn, state, canvas_hw, img,
                                    args.image_min_side,
                                    args.image_max_side, args.prob_thresh)
                vis = draw(img, dets)
                cv2.imshow("afan", cv2.cvtColor(vis, cv2.COLOR_RGB2BGR))
                if cv2.waitKey(1) & 0xFF == ord("q"):
                    break
            frame_idx += 1
        cap.release()


if __name__ == "__main__":
    main()
