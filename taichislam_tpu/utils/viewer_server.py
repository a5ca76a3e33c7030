"""Interactive 3D viewer: browser front-end over the staging API.

The reference's operator tool is a Taichi-GGUI window
(/root/reference/taichi_slam/utils/visualization.py:124-242): live particle
clouds / meshes / skeleton lines, per-drone pose triads and trajectories,
mouse orbit-pan-zoom (:195-215) and an options panel (particle radius,
slice-z, mesher/particle/mesh toggles, :124-141). TPU hosts have no display
stack, so the rebuild serves the same scene to a browser:

- ``ViewerServer``: a dependency-free stdlib HTTP server (runs in a daemon
  thread) exposing
    GET  /           the three.js viewer page (orbit controls, options UI)
    GET  /version    current scene version (client polls cheaply)
    GET  /scene.bin  packed little-endian binary scene snapshot
    GET  /options    viewer options as JSON
    POST /options    update options from the browser panel
- ``InteractiveRender``: drop-in ``TaichiSLAMRender`` subclass whose
  ``rendering()`` publishes the staged scene to the server and pulls the
  panel options back into the same attributes node code already reads
  (``particle_radius``, ``slice_z``, ``enable_mesher``, ``disp_particles``,
  ``disp_mesh``, ``lock_pos_drone`` — matching the reference's options()).

The binary scene format is sectioned: ``u32 magic, u32 version, then
sections [u32 tag, u32 byte_len, payload]``; all floats f32. Tags:
1 particles-xyz, 2 particle-colors, 3 mesh-vertices, 4 mesh-colors,
5 lines, 6 skeleton-edges, 7 drone-poses (id,R,T packed 13 f32),
8 trajectories (id + count + xyz...), 9 particle radius scalar.

three.js is loaded from a CDN in the browser (the HOST needs no network
or GL); without internet the page shows a clear message and the staging
API still works — CI asserts on the HTTP endpoints, not on WebGL.
"""

from __future__ import annotations

import io
import json
import struct
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from taichislam_tpu.utils.visualization import TaichiSLAMRender

_MAGIC = 0x54534C56  # "TSLV"


def _pack_section(tag: int, payload: bytes) -> bytes:
    return struct.pack("<II", tag, len(payload)) + payload


def _f32(a) -> bytes:
    return np.ascontiguousarray(np.asarray(a, np.float32)).tobytes()


class _SceneStore:
    """Latest scene + options, shared between render thread and HTTP."""

    def __init__(self):
        self.lock = threading.Lock()
        self.version = 0
        self.blob = struct.pack("<II", _MAGIC, 0)
        self.options = {
            "particle_radius": 0.025,
            "slice_z": 0.0,
            "enable_mesher": True,
            "disp_particles": True,
            "disp_mesh": True,
            "lock_pos_drone": False,
        }

    def publish(self, blob_body: bytes):
        with self.lock:
            self.version += 1
            self.blob = struct.pack("<II", _MAGIC, self.version) + blob_body

    def snapshot(self):
        with self.lock:
            return self.version, self.blob

    def get_options(self):
        with self.lock:
            return dict(self.options)

    def set_options(self, updates: dict):
        with self.lock:
            for k, v in updates.items():
                if k in self.options:
                    self.options[k] = type(self.options[k])(v)


class ViewerServer:
    def __init__(self, port: int = 8765, host: str = "127.0.0.1"):
        self.store = _SceneStore()
        store = self.store

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _send(self, code, ctype, body: bytes):
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.send_header("Access-Control-Allow-Origin", "*")
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path == "/" or self.path.startswith("/index"):
                    self._send(200, "text/html; charset=utf-8",
                               _PAGE.encode())
                elif self.path.startswith("/version"):
                    v, _ = store.snapshot()
                    self._send(200, "application/json",
                               json.dumps({"version": v}).encode())
                elif self.path.startswith("/scene.bin"):
                    _, blob = store.snapshot()
                    self._send(200, "application/octet-stream", blob)
                elif self.path.startswith("/options"):
                    self._send(200, "application/json",
                               json.dumps(store.get_options()).encode())
                else:
                    self._send(404, "text/plain", b"not found")

            def do_POST(self):
                if self.path.startswith("/options"):
                    n = int(self.headers.get("Content-Length", 0))
                    try:
                        store.set_options(json.loads(self.rfile.read(n)))
                        self._send(200, "application/json", b"{}")
                    except (ValueError, TypeError) as e:
                        self._send(400, "text/plain", str(e).encode())
                else:
                    self._send(404, "text/plain", b"not found")

        self.httpd = ThreadingHTTPServer((host, port), Handler)
        self.port = self.httpd.server_address[1]
        self.thread = threading.Thread(target=self.httpd.serve_forever,
                                       daemon=True)
        self.thread.start()

    @property
    def url(self):
        return f"http://{self.httpd.server_address[0]}:{self.port}/"

    def close(self):
        self.httpd.shutdown()
        self.httpd.server_close()


class InteractiveRender(TaichiSLAMRender):
    """TaichiSLAMRender whose rendering() publishes to a ViewerServer."""

    def __init__(self, port: int = 8765, host: str = "127.0.0.1",
                 max_particles_draw=200000, announce=True, **kw):
        super().__init__(show=False, save_path=None,
                         max_particles_draw=max_particles_draw, **kw)
        self.server = ViewerServer(port=port, host=host)
        if announce:
            print(f"[Viewer] interactive viewer at {self.server.url}")

    def rendering(self):
        out = io.BytesIO()
        if self.par is not None and len(self.par):
            p = self.par
            c = self.par_color
            if len(p) > self.max_particles_draw:
                sel = np.random.default_rng(0).choice(
                    len(p), self.max_particles_draw, replace=False)
                p = p[sel]
                c = c[sel] if c is not None else None
            out.write(_pack_section(1, _f32(p[:, :3])))
            if c is not None:
                out.write(_pack_section(2, _f32(np.clip(c[:, :3], 0, 1))))
        if self.mesh_vertices is not None and len(self.mesh_vertices):
            out.write(_pack_section(3, _f32(self.mesh_vertices[:, :3])))
            if self.mesh_colors is not None and len(self.mesh_colors):
                out.write(_pack_section(
                    4, _f32(np.clip(self.mesh_colors[:, :3], 0, 1))))
        if self.lines is not None and len(self.lines):
            out.write(_pack_section(5, _f32(self.lines[:, :3])))
        for _, edges in self.skeleton_edges.items():
            e = np.asarray(edges, np.float32).reshape(-1, 3)
            if len(e):
                out.write(_pack_section(6, _f32(e)))
        for drone_id, (R, T) in self.drone_poses.items():
            buf = np.concatenate([[float(drone_id)],
                                  np.asarray(R, np.float32).reshape(9),
                                  np.asarray(T, np.float32).reshape(3)])
            out.write(_pack_section(7, _f32(buf)))
        for drone_id, traj in self.drone_trajs.items():
            t = np.asarray(traj, np.float32).reshape(-1, 3)
            buf = np.concatenate([[float(drone_id), float(len(t))],
                                  t.reshape(-1)])
            out.write(_pack_section(8, _f32(buf)))
        out.write(_pack_section(9, _f32([self.particle_radius])))
        self.server.store.publish(out.getvalue())

        # pull panel options back (reference options(), visualization.py:124)
        o = self.server.store.get_options()
        self.particle_radius = o["particle_radius"]
        self.slice_z = o["slice_z"]
        self.enable_mesher = o["enable_mesher"]
        self.disp_particles = o["disp_particles"]
        self.disp_mesh = o["disp_mesh"]
        self.lock_pos_drone = o["lock_pos_drone"]
        self.frame_count += 1

    def options(self):
        pass  # the panel lives in the browser; rendering() syncs it

    def close(self):
        self.server.close()


_PAGE = r"""<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>TaichiSLAM-TPU viewer</title>
<style>
 body{margin:0;background:#10131a;color:#cfd6e4;font:13px system-ui}
 #panel{position:fixed;top:10px;left:10px;background:#1b2030cc;padding:10px
        14px;border-radius:8px;min-width:220px}
 #panel label{display:block;margin:6px 0}
 #msg{position:fixed;bottom:10px;left:10px;color:#8aa}
 input[type=range]{width:120px;vertical-align:middle}
</style></head><body>
<div id="panel">
 <b>TaichiSLAM-TPU</b>
 <label><input type="checkbox" id="disp_particles" checked> particles</label>
 <label><input type="checkbox" id="disp_mesh" checked> mesh</label>
 <label><input type="checkbox" id="enable_mesher" checked> mesher</label>
 <label><input type="checkbox" id="lock_pos_drone"> follow drone</label>
 <label>radius <input type="range" id="particle_radius" min="0.005"
   max="0.1" step="0.005" value="0.025"><span id="rv">0.025</span></label>
 <label>slice z <input type="range" id="slice_z" min="-2" max="2"
   step="0.1" value="0"><span id="sv">0.0</span></label>
 <div id="stats"></div>
</div>
<div id="msg">connecting…</div>
<script type="importmap">{"imports":{
 "three":"https://unpkg.com/three@0.160.0/build/three.module.js",
 "three/addons/":"https://unpkg.com/three@0.160.0/examples/jsm/"}}
</script>
<script type="module">
import * as THREE from 'three';
import {OrbitControls} from 'three/addons/controls/OrbitControls.js';
const msg=document.getElementById('msg');
const scene=new THREE.Scene(); scene.background=new THREE.Color(0x10131a);
const cam=new THREE.PerspectiveCamera(60,innerWidth/innerHeight,0.01,500);
cam.position.set(3,3,2); cam.up.set(0,0,1);
const ren=new THREE.WebGLRenderer({antialias:true});
ren.setSize(innerWidth,innerHeight); document.body.appendChild(ren.domElement);
const controls=new OrbitControls(cam,ren.domElement);
scene.add(new THREE.AmbientLight(0xffffff,0.8));
const dl=new THREE.DirectionalLight(0xffffff,1.2); dl.position.set(2,3,5);
scene.add(dl); scene.add(new THREE.AxesHelper(0.5));
const grid=new THREE.GridHelper(20,40,0x2a3348,0x1d2435);
grid.rotation.x=Math.PI/2; scene.add(grid);
let pts=null, mesh=null, lineGroups=[];
let version=-1, radius=0.025;
function setPoints(xyz,col){
 if(pts){scene.remove(pts); pts.geometry.dispose();}
 const g=new THREE.BufferGeometry();
 g.setAttribute('position',new THREE.BufferAttribute(xyz,3));
 if(col) g.setAttribute('color',new THREE.BufferAttribute(col,3));
 const m=new THREE.PointsMaterial({size:radius*2,vertexColors:!!col,
   color:col?0xffffff:0x4aa3ff,sizeAttenuation:true});
 pts=new THREE.Points(g,m);
 pts.visible=document.getElementById('disp_particles').checked;
 scene.add(pts);
}
function setMesh(v,col){
 if(mesh){scene.remove(mesh); mesh.geometry.dispose();}
 const g=new THREE.BufferGeometry();
 g.setAttribute('position',new THREE.BufferAttribute(v,3));
 if(col) g.setAttribute('color',new THREE.BufferAttribute(col,3));
 g.computeVertexNormals();
 const m=new THREE.MeshStandardMaterial({vertexColors:!!col,
   color:col?0xffffff:0x88aa99,side:THREE.DoubleSide,flatShading:true});
 mesh=new THREE.Mesh(g,m);
 mesh.visible=document.getElementById('disp_mesh').checked;
 scene.add(mesh);
}
function addLines(v,color,width){
 const g=new THREE.BufferGeometry();
 g.setAttribute('position',new THREE.BufferAttribute(v,3));
 const l=new THREE.LineSegments(g,new THREE.LineBasicMaterial({color}));
 lineGroups.push(l); scene.add(l);
}
function clearLines(){for(const l of lineGroups){scene.remove(l);
 l.geometry.dispose();} lineGroups=[];}
async function poll(){
 try{
  const v=await (await fetch('/version')).json();
  if(v.version!==version){
   version=v.version;
   const buf=await (await fetch('/scene.bin')).arrayBuffer();
   parse(buf);
  }
  msg.textContent=`live · v${version}`;
 }catch(e){msg.textContent='disconnected: '+e;}
 setTimeout(poll,100);
}
function parse(buf){
 const dv=new DataView(buf); let off=8;
 let xyz=null,col=null,mv=null,mc=null;
 clearLines();
 let nPar=0,nTri=0;
 while(off+8<=buf.byteLength){
  const tag=dv.getUint32(off,true), len=dv.getUint32(off+4,true); off+=8;
  const f=new Float32Array(buf.slice(off,off+len)); off+=len;
  if(tag===1){xyz=f;nPar=f.length/3;} else if(tag===2){col=f;}
  else if(tag===3){mv=f;nTri=f.length/9;} else if(tag===4){mc=f;}
  else if(tag===5){addLines(f,0x888888);}
  else if(tag===6){addLines(f,0x39d98a);}
  else if(tag===7){
   const T=[f[10],f[11],f[12]];
   for(let a=0;a<3;a++){
    const tip=[T[0]+f[1+a]*0.3,T[1]+f[4+a]*0.3,T[2]+f[7+a]*0.3];
    addLines(new Float32Array([...T,...tip]),[0xff5555,0x55ff66,0x5588ff][a]);
   }
   if(document.getElementById('lock_pos_drone').checked)
    controls.target.set(T[0],T[1],T[2]);
  }
  else if(tag===8){
   const n=f[1]; const seg=new Float32Array(Math.max(0,(n-1))*6);
   for(let i=0;i+1<n;i++){for(let k=0;k<3;k++){
     seg[i*6+k]=f[2+i*3+k]; seg[i*6+3+k]=f[2+(i+1)*3+k];}}
   addLines(seg,0x4aa3ff);
  }
  else if(tag===9){radius=f[0];
   if(pts) pts.material.size=radius*2;}
 }
 if(xyz) setPoints(xyz,col);
 if(mv) setMesh(mv,mc);
 document.getElementById('stats').textContent=
   `${nPar} particles · ${nTri} triangles`;
}
async function pushOptions(){
 const o={};
 for(const id of ['disp_particles','disp_mesh','enable_mesher',
                  'lock_pos_drone'])
  o[id]=document.getElementById(id).checked;
 for(const id of ['particle_radius','slice_z'])
  o[id]=parseFloat(document.getElementById(id).value);
 document.getElementById('rv').textContent=o.particle_radius;
 document.getElementById('sv').textContent=o.slice_z;
 if(pts){pts.visible=o.disp_particles; pts.material.size=
   o.particle_radius*2;}
 if(mesh) mesh.visible=o.disp_mesh;
 await fetch('/options',{method:'POST',body:JSON.stringify(o)});
}
for(const el of document.querySelectorAll('#panel input'))
 el.addEventListener('input',pushOptions);
addEventListener('resize',()=>{cam.aspect=innerWidth/innerHeight;
 cam.updateProjectionMatrix(); ren.setSize(innerWidth,innerHeight);});
(function loop(){requestAnimationFrame(loop); controls.update();
 ren.render(scene,cam);})();
poll();
</script></body></html>
"""
