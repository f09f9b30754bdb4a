"""Interactive browser-based 3D viewer.

TPU-native stand-in for the reference's Open3D window (reference:
cdvslam/o3dviewer.py:63-457): the reference runs an O3D process with a
shared-memory state loop; here a background HTTP thread serves a
three.js page (orbit/pan/zoom camera, colored patch point cloud, camera
trajectory + current-frustum, follow mode, point-size keys) and a JSON
state endpoint the page polls. Dependency-free on the Python side
(stdlib http.server; three.js loads from CDN in the browser), works
over SSH port-forwarding, and shares the SnapshotViewer hook surface
(update_image / add_delta / join).
"""
from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

_PAGE = """<!doctype html>
<html><head><meta charset="utf-8"><title>cdvslam viewer</title>
<style>body{margin:0;overflow:hidden;background:#111;color:#ccc;font:12px monospace}
#hud{position:fixed;top:8px;left:8px;z-index:2;background:#0008;padding:6px 10px;border-radius:4px}
</style></head><body>
<div id="hud">cdvslam — <span id="stat">connecting…</span><br>
keys: <b>f</b> follow · <b>+/-</b> point size</div>
<script type="importmap">{"imports":{
 "three":"https://cdn.jsdelivr.net/npm/three@0.160.0/build/three.module.js",
 "three/addons/":"https://cdn.jsdelivr.net/npm/three@0.160.0/examples/jsm/"}}
</script>
<script type="module">
import * as THREE from 'three';
import {OrbitControls} from 'three/addons/controls/OrbitControls.js';
const scene=new THREE.Scene();
const cam=new THREE.PerspectiveCamera(60,innerWidth/innerHeight,0.01,1000);
cam.position.set(0,-2,-4);cam.up.set(0,-1,0);
const rdr=new THREE.WebGLRenderer({antialias:true});
rdr.setSize(innerWidth,innerHeight);document.body.appendChild(rdr.domElement);
const ctl=new OrbitControls(cam,rdr.domElement);
let psize=0.02,follow=false;
const pmat=new THREE.PointsMaterial({size:psize,vertexColors:true});
let pts=new THREE.Points(new THREE.BufferGeometry(),pmat);scene.add(pts);
const tmat=new THREE.LineBasicMaterial({color:0x4488ff});
let traj=new THREE.Line(new THREE.BufferGeometry(),tmat);scene.add(traj);
const fmat=new THREE.LineBasicMaterial({color:0xff4444});
let frus=new THREE.LineSegments(new THREE.BufferGeometry(),fmat);scene.add(frus);
addEventListener('resize',()=>{cam.aspect=innerWidth/innerHeight;
 cam.updateProjectionMatrix();rdr.setSize(innerWidth,innerHeight);});
addEventListener('keydown',e=>{
 if(e.key=='f')follow=!follow;
 if(e.key=='+'||e.key=='=')pmat.size=psize*=1.3;
 if(e.key=='-')pmat.size=psize/=1.3;});
async function poll(){
 try{
  const s=await (await fetch('state.json')).json();
  document.getElementById('stat').textContent=
   `kf ${s.n} · ${s.points.length/3} pts`;
  const g=new THREE.BufferGeometry();
  g.setAttribute('position',new THREE.Float32BufferAttribute(s.points,3));
  g.setAttribute('color',new THREE.Float32BufferAttribute(s.colors,3));
  pts.geometry.dispose();pts.geometry=g;
  const tg=new THREE.BufferGeometry();
  tg.setAttribute('position',new THREE.Float32BufferAttribute(s.traj,3));
  traj.geometry.dispose();traj.geometry=tg;
  const fg=new THREE.BufferGeometry();
  fg.setAttribute('position',new THREE.Float32BufferAttribute(s.frustum,3));
  frus.geometry.dispose();frus.geometry=fg;
  if(follow&&s.traj.length>=3){
   const k=s.traj.length-3;
   ctl.target.set(s.traj[k],s.traj[k+1],s.traj[k+2]);}
 }catch(e){document.getElementById('stat').textContent='… '+e;}
 setTimeout(poll,500);}
poll();
function loop(){requestAnimationFrame(loop);ctl.update();rdr.render(scene,cam);}
loop();
</script></body></html>"""


def _frustum_segments(pose_inv, scale=0.15):
    """Line-segment vertices of a camera frustum from a c2w (7,) pose."""
    from ..lie.quaternion import qmat
    import jax.numpy as jnp

    R = np.asarray(qmat(jnp.asarray(pose_inv[3:7])[None]))[0]
    C = pose_inv[:3]
    c = [np.array([0, 0, 0.0]),
         np.array([-1, -0.75, 1.5]), np.array([1, -0.75, 1.5]),
         np.array([1, 0.75, 1.5]), np.array([-1, 0.75, 1.5])]
    w = [C + scale * (R @ p) for p in c]
    edges = [(0, 1), (0, 2), (0, 3), (0, 4), (1, 2), (2, 3), (3, 4), (4, 1)]
    out = []
    for a, b in edges:
        out.extend(w[a].tolist())
        out.extend(w[b].tolist())
    return out


class WebViewer:
    """Interactive viewer: same hook surface as SnapshotViewer, rendered
    live in a browser at http://localhost:<port>/."""

    def __init__(self, slam, port=8642, every=5, max_points=120000,
                 host="127.0.0.1"):
        self.slam = slam
        self.every = every
        self.max_points = max_points
        self.count = 0
        self._state = {"n": 0, "points": [], "colors": [], "traj": [],
                       "frustum": []}
        self._lock = threading.Lock()
        viewer = self

        class H(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def do_GET(self):
                if self.path.startswith("/state.json"):
                    with viewer._lock:
                        body = json.dumps(viewer._state).encode()
                    ctype = "application/json"
                else:
                    body = _PAGE.encode()
                    ctype = "text/html"
                self.send_response(200)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        # loopback by default (the viewer is unauthenticated); pass
        # host="0.0.0.0" explicitly to expose it, or use SSH forwarding
        self.server = ThreadingHTTPServer((host, port), H)
        self.port = self.server.server_address[1]
        self.thread = threading.Thread(target=self.server.serve_forever,
                                       daemon=True)
        self.thread.start()
        print(f"[viewer] interactive viewer at http://localhost:{self.port}/")

    # -- runtime hooks (same surface as SnapshotViewer) -----------------
    def update_image(self, image, *args, **kwargs):
        self.count += 1
        if self.count % self.every == 0:
            self.refresh()

    def add_delta(self, *args, **kwargs):
        pass

    def refresh(self):
        slam = self.slam
        n = slam.pg.n
        if n < 2:
            return
        import jax.numpy as jnp
        from ..lie import se3_inv

        poses = np.asarray(slam.pg.poses_[:n])
        inv = np.asarray(se3_inv(jnp.asarray(poses)))
        centers = inv[:, :3]
        pts = np.asarray(slam.points()[: slam.pg.m])
        clr = np.asarray(slam.pg.colors_[: slam.pg.n]).reshape(-1, 3)[: len(pts)]
        valid = np.isfinite(pts).all(axis=1) & (np.abs(pts) < 1e3).all(axis=1)
        pts, clr = pts[valid], clr[valid]
        if len(pts) > self.max_points:
            sel = np.linspace(0, len(pts) - 1, self.max_points).astype(int)
            pts, clr = pts[sel], clr[sel]
        state = {
            "n": int(n),
            "points": np.round(pts, 4).reshape(-1).tolist(),
            "colors": (clr.astype(np.float32) / 255.0).round(3).reshape(-1).tolist(),
            "traj": np.round(centers, 4).reshape(-1).tolist(),
            "frustum": _frustum_segments(inv[-1]),
        }
        with self._lock:
            self._state = state

    def join(self):
        self.refresh()
        self.server.shutdown()
