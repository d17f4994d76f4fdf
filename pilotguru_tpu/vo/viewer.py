"""Live tracking viewer: HTTP MJPEG frame stream + map state.

Runtime equivalent of the reference's Pangolin windows
(/root/reference/thirdparty/orb-slam2/src/Viewer.cc: FrameDrawer shows the
current frame with tracked keypoints, MapDrawer the keyframe trajectory +
map point cloud, wired via --visualize in src/optical_trajectories.cc:47).
This image is headless (no X11/Pangolin/Qt), so the live view is served
over HTTP instead — any browser pointed at the port shows the tracked
frame stream and a top-down live map while a ride tracks:

- ``/``            tiny HTML page: frame stream + canvas map (polls state)
- ``/stream.mjpg`` multipart/x-mixed-replace MJPEG of overlay frames
- ``/frame.jpg``   latest overlay frame as a single JPEG
- ``/state.json``  tracker state: keyframe centers, map cloud, status

The tracking loop publishes; handlers serialize on demand under a lock,
so an idle viewer costs the tracker one JPEG encode per frame and nothing
else. Everything is stdlib ``http.server`` + cv2 JPEG encoding — no new
dependencies.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

_PAGE = """<!doctype html>
<html><head><title>pilotguru_tpu live tracker</title>
<style>
 body { background:#111; color:#ddd; font-family:monospace; margin:1em; }
 .row { display:flex; gap:1em; flex-wrap:wrap; }
 img, canvas { border:1px solid #444; background:#000; }
 #status { margin:0.5em 0; }
</style></head>
<body>
<h3>pilotguru_tpu live tracker</h3>
<div id="status">connecting...</div>
<div class="row">
  <img id="frame" src="/stream.mjpg" width="640"/>
  <canvas id="map" width="480" height="480"></canvas>
</div>
<script>
const cv = document.getElementById('map').getContext('2d');
async function tick() {
  try {
    const s = await (await fetch('/state.json')).json();
    document.getElementById('status').textContent =
      `frame ${s.frame_id}  state ${s.state}  inliers ${s.inliers}  ` +
      `map ${s.map_points}  keyframes ${s.keyframes}`;
    cv.fillStyle = '#000'; cv.fillRect(0, 0, 480, 480);
    const pts = s.points || [], kfs = s.keyframe_centers || [];
    const all = pts.concat(kfs);
    if (all.length) {
      let xs = all.map(p => p[0]), zs = all.map(p => p[2]);
      const cx = (Math.min(...xs) + Math.max(...xs)) / 2;
      const cz = (Math.min(...zs) + Math.max(...zs)) / 2;
      const span = Math.max(
        Math.max(...xs) - Math.min(...xs),
        Math.max(...zs) - Math.min(...zs), 1e-3);
      const sc = 440 / span;
      const X = p => 240 + (p[0] - cx) * sc;
      const Y = p => 240 + (p[2] - cz) * sc;
      cv.fillStyle = '#2a6';
      for (const p of pts) cv.fillRect(X(p) - 1, Y(p) - 1, 2, 2);
      cv.strokeStyle = '#e33'; cv.lineWidth = 2; cv.beginPath();
      kfs.forEach((p, i) => i ? cv.lineTo(X(p), Y(p)) : cv.moveTo(X(p), Y(p)));
      cv.stroke();
    }
  } catch (e) { document.getElementById('status').textContent = 'offline'; }
  setTimeout(tick, 500);
}
tick();
</script></body></html>"""


class LiveViewer:
    """Threaded HTTP live view. Start with port=0 for an ephemeral port
    (read it back from ``.port``); ``publish_frame`` / ``publish_state``
    are called from the tracking loop; ``close()`` stops the server."""

    def __init__(self, port: int = 0, max_cloud_points: int = 2000):
        self._lock = threading.Condition()
        self._jpeg: bytes | None = None
        self._jpeg_seq = 0
        self._state: dict = {
            "frame_id": -1, "state": "STARTING", "inliers": 0,
            "map_points": 0, "keyframes": 0,
        }
        self._max_cloud = max_cloud_points
        viewer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *args):  # keep the tracker's stdout clean
                pass

            def _send(self, code, ctype, body: bytes):
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.send_header("Cache-Control", "no-store")
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path in ("/", "/index.html"):
                    self._send(200, "text/html", _PAGE.encode())
                elif self.path == "/state.json":
                    with viewer._lock:
                        body = json.dumps(viewer._state).encode()
                    self._send(200, "application/json", body)
                elif self.path == "/frame.jpg":
                    with viewer._lock:
                        jpeg = viewer._jpeg
                    if jpeg is None:
                        self._send(404, "text/plain", b"no frame yet")
                    else:
                        self._send(200, "image/jpeg", jpeg)
                elif self.path == "/stream.mjpg":
                    self.send_response(200)
                    self.send_header(
                        "Content-Type",
                        "multipart/x-mixed-replace; boundary=pgtpuframe",
                    )
                    self.end_headers()
                    seq = -1
                    try:
                        while True:
                            with viewer._lock:
                                viewer._lock.wait_for(
                                    lambda: viewer._jpeg_seq != seq
                                    or viewer._closed,
                                    timeout=2.0,
                                )
                                if viewer._closed:
                                    return
                                jpeg, seq = viewer._jpeg, viewer._jpeg_seq
                            if jpeg is None:
                                continue
                            self.wfile.write(
                                b"--pgtpuframe\r\n"
                                b"Content-Type: image/jpeg\r\n"
                                + f"Content-Length: {len(jpeg)}\r\n\r\n".encode()
                            )
                            self.wfile.write(jpeg)
                            self.wfile.write(b"\r\n")
                    except (BrokenPipeError, ConnectionResetError):
                        return
                else:
                    self._send(404, "text/plain", b"not found")

        self._closed = False
        self._server = ThreadingHTTPServer(("0.0.0.0", port), Handler)
        self._server.daemon_threads = True
        self.port = self._server.server_address[1]
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True
        )
        self._thread.start()

    def publish_frame(self, bgr: np.ndarray):
        """Encode + publish one overlay frame (BGR uint8)."""
        import cv2

        ok, buf = cv2.imencode(".jpg", bgr, [cv2.IMWRITE_JPEG_QUALITY, 80])
        if not ok:
            return
        with self._lock:
            self._jpeg = buf.tobytes()
            self._jpeg_seq += 1
            self._lock.notify_all()

    def publish_state(self, tracker, frame_id: int, state, inliers: int):
        """Snapshot tracker map state (MapDrawer equivalent): keyframe
        camera centers + a subsampled world point cloud."""
        valid = np.asarray(tracker.point_valid)
        pts = np.asarray(tracker.points)[valid]
        if len(pts) > self._max_cloud:
            step = -(-len(pts) // self._max_cloud)
            pts = pts[::step]
        centers = []
        for kf in tracker.keyframes:
            r, t = kf.pose6[:3], kf.pose6[3:]
            rot = _rotvec_matrix(np.asarray(r, np.float64))
            centers.append((-rot.T @ np.asarray(t, np.float64)).tolist())
        snapshot = {
            "frame_id": int(frame_id),
            "state": str(state),
            "inliers": int(inliers),
            "map_points": int(valid.sum()),
            "keyframes": len(tracker.keyframes),
            "points": np.round(pts, 4).tolist(),
            "keyframe_centers": [
                [round(v, 4) for v in c] for c in centers
            ],
        }
        with self._lock:
            self._state = snapshot

    def close(self):
        with self._lock:
            self._closed = True
            self._lock.notify_all()
        self._server.shutdown()
        self._server.server_close()


def _rotvec_matrix(r: np.ndarray) -> np.ndarray:
    """Rodrigues rotation-vector -> matrix (host-side, viewer only)."""
    theta = float(np.linalg.norm(r))
    if theta < 1e-12:
        return np.eye(3)
    k = r / theta
    kx = np.array(
        [[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]]
    )
    return np.eye(3) + np.sin(theta) * kx + (1 - np.cos(theta)) * (kx @ kx)
