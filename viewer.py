#!/usr/bin/env python
"""Interactive viewer — TPU-native equivalent of the reference's dearpygui
GUI (/root/reference/gui.py: SP_GS_GUI — camera orbit, time/pose animation,
superpoint coloring, 2D skeleton overlay draw_skeleton:747, interactive
reposing control_joint:333/set_pose:422).

Re-designed as a zero-dependency web app: a stdlib HTTP server drives the
jitted render function and streams PNG frames to a canvas UI (orbit = drag,
zoom = wheel, time slider, per-joint pose sliders, skeleton overlay). This
keeps the accelerator hot on the server side — the browser only displays
frames, so it works across the TPU tunnel where a native GUI cannot.

    python viewer.py -c <config.yaml> --load <ckpt.npz> [--port 8090]
        [--stage sk] [--host 127.0.0.1]
"""
import argparse
import io
import json
import logging
import sys
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path
from urllib.parse import parse_qs, urlparse

import numpy as np

sys.path.insert(0, str(Path(__file__).parent))

log = logging.getLogger('viewer')

PAGE = """<!DOCTYPE html>
<html><head><title>sk_gs_tpu viewer</title><style>
body{font-family:sans-serif;margin:12px;background:#1e1e1e;color:#ddd}
#wrap{display:flex;gap:16px}
canvas{border:1px solid #555;cursor:grab}
.panel{min-width:260px}
label{display:block;margin-top:8px;font-size:13px}
input[type=range]{width:220px}
select,button{margin-top:4px}
#status{margin-top:10px;font-size:12px;color:#9a9}
</style></head><body>
<h3>sk_gs_tpu viewer</h3>
<div id=wrap>
<div><canvas id=cv width=512 height=512></canvas></div>
<div class=panel>
 <label>time <span id=tv>0.00</span>
  <input type=range id=time min=0 max=1 step=0.01 value=0></label>
 <label>mode
  <select id=mode><option>rgb</option><option>superpoints</option>
  <option>opacity</option></select></label>
 <label><input type=checkbox id=skel> skeleton overlay</label>
 <label>joint <select id=joint></select></label>
 <label>rot x <span id=jx>0</span>
  <input type=range id=rx min=-3.14 max=3.14 step=0.02 value=0></label>
 <label>rot y <span id=jy>0</span>
  <input type=range id=ry min=-3.14 max=3.14 step=0.02 value=0></label>
 <label>rot z <span id=jz>0</span>
  <input type=range id=rz min=-3.14 max=3.14 step=0.02 value=0></label>
 <button id=resetpose>reset pose</button>
 <button id=resetcam>reset camera</button>
 <div id=status>loading…</div>
</div></div>
<script>
let info=null, theta=0, phi=0.3, radius=4, pose={}, busy=false, dirty=true;
let sel=-1;
const cv=document.getElementById('cv'), ctx=cv.getContext('2d');
const $=id=>document.getElementById(id);
async function init(){
  info=await (await fetch('info')).json();
  radius=info.radius;
  const sel=$('joint');
  for(let i=0;i<info.num_joints;i++){
    const o=document.createElement('option');o.text=i;sel.add(o);}
  sel.onchange=()=>{const d=pose[sel.value]||[0,0,0];
    $('rx').value=d[0];$('ry').value=d[1];$('rz').value=d[2];};
  $('status').textContent=`stage=${info.stage} joints=${info.num_joints} `+
    `superpoints=${info.num_superpoints} ${info.width}x${info.height}`;
  loop();
}
function poseCSV(){
  const out=[];
  for(let i=0;i<info.num_joints;i++){
    const d=pose[i]||[0,0,0]; out.push(d.join(','));}
  return out.join(';');
}
async function draw(){
  if(busy||!dirty)return; busy=true; dirty=false;
  const q=`theta=${theta}&phi=${phi}&radius=${radius}`+
    `&t=${$('time').value}&mode=${$('mode').value}&pose=${poseCSV()}`+
    `&sel=${sel}`;
  const img=new Image();
  img.onload=async()=>{
    ctx.drawImage(img,0,0,cv.width,cv.height);
    if($('skel').checked){
      const sk=await (await fetch('skeleton?'+q)).json();
      ctx.strokeStyle='#ff0';ctx.fillStyle='#f60';ctx.lineWidth=2;
      const sx=cv.width/info.width, sy=cv.height/info.height;
      for(const [a,b] of sk.bones){
        ctx.beginPath();
        ctx.moveTo(sk.xy[a][0]*sx,sk.xy[a][1]*sy);
        ctx.lineTo(sk.xy[b][0]*sx,sk.xy[b][1]*sy);ctx.stroke();}
      sk.xy.forEach((p,i)=>{if(!sk.alive[i])return;
        ctx.beginPath();ctx.arc(p[0]*sx,p[1]*sy,4,0,7);ctx.fill();});
    }
    busy=false;
  };
  img.onerror=()=>{busy=false;};
  img.src='render?'+q;
}
function loop(){draw();requestAnimationFrame(loop);}
let drag=null, moved=0, downXY=null;
cv.onmousedown=e=>{drag=[e.clientX,e.clientY];moved=0;
  downXY=[e.offsetX,e.offsetY];};
window.onmouseup=async e=>{
  const wasClick=drag&&moved<4&&downXY;
  drag=null;
  if(!wasClick)return;
  // click (not drag): pick the dominant superpoint under the pixel
  const x=downXY[0]*info.width/cv.width, y=downXY[1]*info.height/cv.height;
  const q=`theta=${theta}&phi=${phi}&radius=${radius}`+
    `&t=${$('time').value}&pose=${poseCSV()}&x=${x}&y=${y}`;
  const p=await (await fetch('pick?'+q)).json();
  sel=p.superpoint;
  if(sel>=0){
    $('joint').value=sel;
    const d=pose[sel]||[0,0,0];
    $('rx').value=d[0];$('ry').value=d[1];$('rz').value=d[2];
    $('status').textContent=
      `picked superpoint/joint ${sel} (weight ${p.weight})`;
  }else{
    $('status').textContent='picked background';
  }
  dirty=true;};
window.onmousemove=e=>{
  if(!drag)return;
  moved+=Math.abs(e.clientX-drag[0])+Math.abs(e.clientY-drag[1]);
  theta+=(e.clientX-drag[0])*0.01; phi+=(e.clientY-drag[1])*0.01;
  phi=Math.max(-1.5,Math.min(1.5,phi));
  drag=[e.clientX,e.clientY]; dirty=true;};
cv.onwheel=e=>{e.preventDefault();radius*=Math.exp(e.deltaY*0.001);dirty=true;};
for(const id of ['time','mode','skel'])
  $(id).oninput=()=>{$('tv').textContent=(+$('time').value).toFixed(2);dirty=true;};
for(const id of ['rx','ry','rz'])
  $(id).oninput=()=>{
    const j=$('joint').value;
    pose[j]=[+$('rx').value,+$('ry').value,+$('rz').value];
    $('jx').textContent=$('rx').value;$('jy').textContent=$('ry').value;
    $('jz').textContent=$('rz').value; dirty=true;};
$('resetpose').onclick=()=>{pose={};
  for(const id of ['rx','ry','rz'])$(id).value=0; dirty=true;};
$('resetcam').onclick=()=>{theta=0;phi=0.3;radius=info.radius;dirty=true;};
init();
</script></body></html>"""


def superpoint_palette(m: int) -> np.ndarray:
    """Distinct color per superpoint (golden-ratio hue walk, like the
    reference's per-superpoint coloring in the GUI picking path)."""
    hues = (np.arange(m) * 0.61803398875) % 1.0
    c = np.ones(m)
    x = 1.0 - np.abs((hues * 6) % 2 - 1)
    rgb = np.zeros((m, 3), np.float32)
    for i, h in enumerate(hues):
        k = int(h * 6) % 6
        r, g, b = [(c[i], x[i], 0), (x[i], c[i], 0), (0, c[i], x[i]),
                   (0, x[i], c[i]), (x[i], 0, c[i]), (c[i], 0, x[i])][k]
        rgb[i] = (r, g, b)
    return 0.2 + 0.8 * rgb


class ViewerState:
    """Owns the model and the jitted render fns; serializes device access."""

    def __init__(self, cfg, scene, meta, skcfg, rcfg, model, stage: str):
        import jax
        import jax.numpy as jnp
        from sk_gs_tpu.models.gaussian_splatting import gaussian_inputs
        from sk_gs_tpu.models.sk_gs import forward_deltas
        from sk_gs_tpu.ops import se3
        from sk_gs_tpu.render import (composite_background, render,
                                      render_topk)

        self.lock = threading.Lock()
        self.scene, self.meta = scene, meta
        self.skcfg, self.rcfg = skcfg, rcfg
        self.model = model
        self.stage = stage
        self.w, self.h = scene.image_size
        campos0 = np.asarray(scene.campos[0])
        self.radius0 = float(np.linalg.norm(campos0))
        self.m = skcfg.num_superpoints
        self.palette = jnp.asarray(superpoint_palette(self.m))
        base_view = scene.view(0)
        self.base_view = base_view
        from sk_gs_tpu.ops import transforms as tf

        def make_view(theta, phi, radius):
            eye = jnp.asarray([radius * np.cos(phi) * np.sin(theta),
                               radius * np.sin(phi),
                               -radius * np.cos(phi) * np.cos(theta)],
                              jnp.float32)
            Tw2v = tf.look_at(eye, jnp.zeros(3),
                              jnp.asarray([0.0, -1.0, 0.0]), coord='opencv')
            return base_view._replace(Tw2v=Tw2v, campos=eye)

        self.make_view = make_view

        @jax.jit
        def _render_rgb(model, view, t, sk_r_delta, sel):
            del sel  # highlight only applies to superpoint mode
            out_def = forward_deltas(skcfg, model, t, stage,
                                     sk_r_delta=sk_r_delta
                                     if stage in ('sk', 'sk_fix') else None,
                                     training=False)
            g = gaussian_inputs(model.gauss_view(), skcfg.gauss,
                                d_xyz=out_def.d_xyz,
                                d_rotation=out_def.d_rotation,
                                d_scaling=out_def.d_scaling)
            out = render(g, view, rcfg,
                         active_sh_degree=model.active_sh_degree)
            img = composite_background(out['images'], out['opacity'],
                                       jnp.ones(3))
            return img, out['opacity']

        @jax.jit
        def _render_sp(model, view, t, sk_r_delta, sel):
            out_def = forward_deltas(skcfg, model, t, stage,
                                     sk_r_delta=sk_r_delta
                                     if stage in ('sk', 'sk_fix') else None,
                                     training=False)
            g = gaussian_inputs(model.gauss_view(), skcfg.gauss,
                                d_xyz=out_def.d_xyz,
                                d_rotation=out_def.d_rotation,
                                d_scaling=out_def.d_scaling)
            # picked superpoint (sel >= 0) renders white (gui.py highlight)
            sp = model.p2sp % self.m
            cols = jnp.where((sp == sel)[:, None],
                             jnp.ones(3), self.palette[sp])
            g = g._replace(colors=cols, sh=None)
            out = render(g, view, rcfg)
            return composite_background(out['images'], out['opacity'],
                                        jnp.ones(3) * 0.1), out['opacity']

        @jax.jit
        def _topk(model, view, t, sk_r_delta):
            out_def = forward_deltas(skcfg, model, t, stage,
                                     sk_r_delta=sk_r_delta
                                     if stage in ('sk', 'sk_fix') else None,
                                     training=False)
            g = gaussian_inputs(model.gauss_view(), skcfg.gauss,
                                d_xyz=out_def.d_xyz,
                                d_rotation=out_def.d_rotation,
                                d_scaling=out_def.d_scaling)
            return render_topk(g, view, rcfg, k=8)

        @jax.jit
        def _skeleton_2d(model, view, t, sk_r_delta):
            out_def = forward_deltas(skcfg, model, t, 'sk',
                                     sk_r_delta=sk_r_delta, training=False)
            sk_T = out_def.aux['skT']
            pos_w = se3.se3_act(sk_T, model.params['joints'])
            ones = jnp.ones((pos_w.shape[0], 1))
            hom = jnp.concatenate([pos_w, ones], -1)
            p_view = hom @ view.Tw2v.T
            p_clip = p_view @ view.Tv2c.T
            ndc = p_clip[:, :2] / jnp.maximum(p_clip[:, 3:4], 1e-6)
            x = ((ndc[:, 0] + 1) * self.w - 1) * 0.5
            y = ((ndc[:, 1] + 1) * self.h - 1) * 0.5
            return jnp.stack([x, y], -1), p_view[:, 2]

        self._render = {'rgb': _render_rgb, 'superpoints': _render_sp,
                        'opacity': _render_rgb}
        self._skeleton_2d = _skeleton_2d
        self._topk = _topk
        self._jnp = jnp

    def render_png(self, theta, phi, radius, t, mode, pose,
                   sel: int = -1) -> bytes:
        from PIL import Image
        jnp = self._jnp
        with self.lock:
            view = self.make_view(theta, phi, radius)
            img, opac = self._render[mode](
                self.model, view, jnp.asarray(t, jnp.float32),
                jnp.asarray(pose), jnp.asarray(sel, jnp.int32))
            if mode == 'opacity':
                arr = np.asarray(opac)
                arr = np.repeat(arr[..., None], 3, -1)
            else:
                arr = np.asarray(img)
        buf = io.BytesIO()
        Image.fromarray(
            (np.clip(arr, 0, 1) * 255).astype(np.uint8)).save(buf, 'PNG')
        return buf.getvalue()

    def pick_json(self, theta, phi, radius, t, pose, px: int, py: int) -> bytes:
        """Click-to-select: dominant superpoint under pixel (px, py) via the
        per-pixel top-k blend weights (gui.py:333 + gaussian_render.py:343)."""
        jnp = self._jnp
        px = min(max(px, 0), self.w - 1)
        py = min(max(py, 0), self.h - 1)
        with self.lock:
            view = self.make_view(theta, phi, radius)
            idx, wts = self._topk(self.model, view,
                                  jnp.asarray(t, jnp.float32),
                                  jnp.asarray(pose))
            idx_px = np.asarray(idx[py, px])
            w_px = np.asarray(wts[py, px])
            p2sp = np.asarray(self.model.p2sp) % self.m
        sp, weight = dominant_superpoint(idx_px, w_px, p2sp, self.m)
        return json.dumps({'superpoint': sp, 'weight': round(weight, 4),
                           'x': px, 'y': py}).encode()

    def skeleton_json(self, theta, phi, radius, t, pose) -> bytes:
        jnp = self._jnp
        with self.lock:
            view = self.make_view(theta, phi, radius)
            xy, depth = self._skeleton_2d(self.model, view,
                                          jnp.asarray(t, jnp.float32),
                                          jnp.asarray(pose))
        xy = np.asarray(xy)
        parents = np.asarray(self.model.joint_parents[:, 0])
        alive = np.asarray(self.model.sp_alive)
        root = int(self.model.joint_root)
        # dead joints (and joints behind the camera) project to garbage —
        # mask them out of both dots and bones
        ok = alive & np.isfinite(xy).all(-1) & (np.asarray(depth) > 0) \
            & (np.abs(xy) < 4 * max(self.w, self.h)).all(-1)
        bones = [[int(i), int(parents[i])] for i in range(len(parents))
                 if ok[i] and ok[parents[i]] and i != root and parents[i] >= 0]
        xy = np.where(ok[:, None], xy, -1e4)
        return json.dumps({'xy': np.round(xy, 1).tolist(),
                           'alive': ok.astype(int).tolist(),
                           'bones': bones, 'root': root}).encode()

    def info_json(self) -> bytes:
        return json.dumps({
            'num_joints': self.m, 'num_superpoints': self.m,
            'width': self.w, 'height': self.h, 'stage': self.stage,
            'radius': self.radius0,
            'num_frames': int(self.meta.num_frames)}).encode()


def dominant_superpoint(idx_px: np.ndarray, w_px: np.ndarray,
                        p2sp: np.ndarray, m: int):
    """Aggregate per-pixel top-k Gaussian blend weights by superpoint and
    return (winning superpoint id, its summed weight); (-1, 0.0) when no
    valid contributor (background pixel). idx entries < 0 or >= len(p2sp)
    are padding from the top-k merge."""
    valid = (idx_px >= 0) & (idx_px < len(p2sp))
    if not valid.any():
        return -1, 0.0
    sp_ids = p2sp[idx_px[valid]]
    acc = np.zeros(m, np.float64)
    np.add.at(acc, sp_ids, w_px[valid])
    sp = int(acc.argmax())
    return sp, float(acc[sp])


def parse_pose(s: str, m: int) -> np.ndarray:
    out = np.zeros((m, 3), np.float32)
    if s:
        for i, part in enumerate(s.split(';')[:m]):
            try:
                vals = [float(v) for v in part.split(',')]
                out[i, :len(vals[:3])] = vals[:3]
            except ValueError:
                pass
    return out


def make_handler(state: ViewerState):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):
            log.debug(fmt, *args)

        def _send(self, code, ctype, body):
            self.send_response(code)
            self.send_header('Content-Type', ctype)
            self.send_header('Content-Length', str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            u = urlparse(self.path)
            q = {k: v[0] for k, v in parse_qs(u.query).items()}
            try:
                if u.path == '/':
                    self._send(200, 'text/html', PAGE.encode())
                elif u.path == '/info':
                    self._send(200, 'application/json', state.info_json())
                elif u.path in ('/render', '/skeleton', '/pick'):
                    try:
                        theta = float(q.get('theta', 0))
                        phi = float(q.get('phi', 0.3))
                        radius = float(q.get('radius', state.radius0))
                        t = min(max(float(q.get('t', 0)), 0.0), 1.0)
                    except ValueError as e:
                        self._send(400, 'text/plain',
                                   f'bad query parameter: {e}'.encode())
                        return
                    pose = parse_pose(q.get('pose', ''), state.m)
                    if u.path == '/render':
                        mode = q.get('mode', 'rgb')
                        if mode not in state._render:
                            self._send(400, 'text/plain',
                                       f'bad mode {mode!r}'.encode())
                            return
                        sel = int(q.get('sel', -1))
                        self._send(200, 'image/png', state.render_png(
                            theta, phi, radius, t, mode, pose, sel))
                    elif u.path == '/pick':
                        self._send(200, 'application/json', state.pick_json(
                            theta, phi, radius, t, pose,
                            int(float(q.get('x', 0))),
                            int(float(q.get('y', 0)))))
                    else:
                        self._send(200, 'application/json',
                                   state.skeleton_json(theta, phi, radius,
                                                       t, pose))
                else:
                    self._send(404, 'text/plain', b'not found')
            except BrokenPipeError:
                pass
            except Exception as e:  # surface errors to the client
                log.exception('request failed')
                self._send(500, 'text/plain', repr(e).encode())
    return Handler


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument('-c', '--config', required=True)
    parser.add_argument('--load', required=True)
    parser.add_argument('--port', type=int, default=8090)
    parser.add_argument('--host', default='127.0.0.1')
    parser.add_argument('--stage', default='sk',
                        help='forward mode: sk/sp/init/static')
    parser.add_argument('--set', nargs='*', default=[], dest='overrides')
    args = parser.parse_args(argv)

    logging.basicConfig(level=logging.INFO)
    import jax
    from sk_gs_tpu.framework.checkpoint import load_into_pytree
    from sk_gs_tpu.framework.config import make_config
    from sk_gs_tpu.models import sk_gs
    from sk_gs_tpu.models.gaussian_splatting import init_from_pcd
    from train import build_model_cfg, build_scene

    cfg = make_config(args.config, args.overrides)
    scene, meta, _, _pcd = build_scene(cfg)
    skcfg, rcfg = build_model_cfg(cfg, meta, scene.image_size)

    rng = np.random.default_rng(int(cfg['train'].get('seed', 0)))
    n0 = int(cfg['train'].get('num_init_points', 2000))
    pts = rng.uniform(-1.3, 1.3, size=(n0, 3)).astype(np.float32)
    cols = rng.uniform(size=(n0, 3)).astype(np.float32)
    base = init_from_pcd(pts, cols, skcfg.gauss)
    model = sk_gs.init_model(jax.random.PRNGKey(0), skcfg, base,
                             np.asarray(meta.train_times))
    loaded = load_into_pytree({'state': {'model': model, 'opt': None},
                               'meta': {'step': 0}}, args.load)
    model = loaded['state']['model']

    state = ViewerState(cfg, scene, meta, skcfg, rcfg, model, args.stage)
    server = ThreadingHTTPServer((args.host, args.port), make_handler(state))
    log.info('viewer at http://%s:%d/ (stage=%s) — first render compiles',
             args.host, args.port, args.stage)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass


if __name__ == '__main__':
    main()
