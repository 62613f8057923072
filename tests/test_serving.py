"""Serving-layer tests: the websocket micro-batcher (stubbed detect path —
no model compile) and the batched detect post-processing."""
import asyncio

import numpy as np

from afan.cli.infer_detect import detect_batch
from afan.cli.serve_websocket import FrameBatcher


class FakeDetectFn:
    """Stands in for the jitted detect path: (B,P,C) outputs where each
    frame's top-left pixel value selects the 'detection' probability —
    proves per-frame routing through the batch."""

    def __init__(self, P=5, C=3):
        self.P, self.C = P, C
        self.batch_sizes = []

    def __call__(self, state, images):
        images = np.asarray(images)
        b = images.shape[0]
        self.batch_sizes.append(b)
        boxes = np.tile(np.asarray([10.0, 10.0, 20.0, 20.0]),
                        (b, self.P, self.C, 1))
        probs = np.zeros((b, self.P, self.C), np.float32)
        probs[:, 0, 1] = images[:, 0, 0, 0]  # frame-identifying prob
        keep = np.zeros((b, self.P, self.C), bool)
        keep[:, 0, 1] = True
        return boxes, probs, keep


class TestDetectBatch:
    def test_per_frame_rescale_and_threshold(self):
        fn = FakeDetectFn()
        canvases = np.zeros((2, 8, 8, 3), np.float32)
        canvases[0, 0, 0, 0] = 0.9
        canvases[1, 0, 0, 0] = 0.3   # below threshold
        res = detect_batch(fn, None, canvases, [2.0, 1.0], 0.5)
        assert len(res) == 2
        assert len(res[0]) == 1 and len(res[1]) == 0
        box, c, p = res[0][0]
        np.testing.assert_allclose(box, [5.0, 5.0, 10.0, 10.0])  # /scale
        assert c == 1 and abs(p - 0.9) < 1e-6


class TestFrameBatcher:
    def _mk(self, fn, max_batch=4):
        return FrameBatcher(fn, None, (8, 8), 8.0, 8.0, 0.5,
                            max_batch=max_batch)

    def test_single_frame_uses_batch_one(self):
        fn = FakeDetectFn()
        b = self._mk(fn)

        async def go():
            worker = asyncio.create_task(b.worker())
            img = np.zeros((8, 8, 3), np.float32)
            img[0, 0, 0] = 0.8
            dets = await b.submit(img)
            worker.cancel()
            return dets

        dets = asyncio.run(go())
        assert len(dets) == 1
        assert fn.batch_sizes == [1]

    def test_concurrent_frames_are_batched_and_padded(self):
        fn = FakeDetectFn()
        b = self._mk(fn, max_batch=4)

        async def go():
            imgs = []
            for i in range(3):
                img = np.zeros((8, 8, 3), np.float32)
                img[0, 0, 0] = 0.6 + 0.1 * i
                imgs.append(img)
            # enqueue all before the worker starts draining
            subs = [asyncio.create_task(b.submit(im)) for im in imgs]
            await asyncio.sleep(0)          # let submits enqueue
            worker = asyncio.create_task(b.worker())
            out = await asyncio.gather(*subs)
            worker.cancel()
            return out

        out = asyncio.run(go())
        # 3 pending frames → one padded batch of max_batch
        assert fn.batch_sizes == [4]
        probs = [dets[0][2] for dets in out]
        # resize round-trips through uint8 → ~1/255 quantization
        np.testing.assert_allclose(probs, [0.6, 0.7, 0.8], atol=0.005)

    def test_device_error_propagates(self):
        class Boom:
            def __call__(self, state, images):
                raise RuntimeError("device on fire")

        b = self._mk(Boom())

        async def go():
            worker = asyncio.create_task(b.worker())
            try:
                await b.submit(np.zeros((8, 8, 3), np.float32))
            except RuntimeError as e:
                return str(e)
            finally:
                worker.cancel()
            return None

        assert asyncio.run(go()) == "device on fire"
