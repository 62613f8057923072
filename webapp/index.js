// A-FAN TPU websocket detection client.
// Streams raw 480x640 RGB frames to ws://<host>:8765 and draws the JSON
// detections it gets back — the same wire protocol as the reference's
// Detection/infer_websocket.py / webapp client, reimplemented without the
// vendored opencv.js WASM (plain getUserMedia + canvas).
const W = 640, H = 480;
const video = document.getElementById("video");
const overlay = document.getElementById("overlay").getContext("2d");
const grab = document.getElementById("grab").getContext("2d",
    { willReadFrequently: true });
const status = document.getElementById("status");

const wsUrl = `ws://${location.hostname || "localhost"}:8765`;
let ws = null, busy = false;

function connect() {
  ws = new WebSocket(wsUrl);
  ws.binaryType = "arraybuffer";
  ws.onopen = () => { status.textContent = `connected to ${wsUrl}`; tick(); };
  ws.onclose = () => { status.textContent = "disconnected — retrying…";
                       busy = false; setTimeout(connect, 1500); };
  ws.onmessage = (ev) => { drawDetections(JSON.parse(ev.data)); busy = false; };
}

function tick() {
  if (!ws || ws.readyState !== WebSocket.OPEN) return;
  if (!busy && video.readyState >= 2) {
    grab.drawImage(video, 0, 0, W, H);
    const rgba = grab.getImageData(0, 0, W, H).data;
    const rgb = new Uint8Array(W * H * 3);
    for (let i = 0, j = 0; i < rgba.length; i += 4) {
      rgb[j++] = rgba[i]; rgb[j++] = rgba[i + 1]; rgb[j++] = rgba[i + 2];
    }
    ws.send(rgb.buffer);
    busy = true;
  }
  requestAnimationFrame(tick);
}

function drawDetections(dets) {
  overlay.clearRect(0, 0, W, H);
  overlay.lineWidth = 2;
  overlay.font = "14px sans-serif";
  for (const d of dets) {
    const [x1, y1, x2, y2] = d.bbox;
    const hue = (d.label * 47) % 360;
    overlay.strokeStyle = `hsl(${hue},90%,60%)`;
    overlay.fillStyle = `hsl(${hue},90%,60%)`;
    overlay.strokeRect(x1, y1, x2 - x1, y2 - y1);
    overlay.fillText(`${d.label} ${(d.prob * 100).toFixed(0)}%`,
                     x1 + 2, Math.max(y1 - 4, 12));
  }
}

navigator.mediaDevices.getUserMedia({ video: { width: W, height: H } })
  .then((stream) => { video.srcObject = stream; connect(); })
  .catch((e) => { status.textContent = `camera error: ${e}`; });
