"""Visualizer: transport->WebSocket bridge + self-contained WebGL viewer.

Reference: ``receiver/visualizer/`` — an asyncio ZMQ-PULL -> WebSocket binary
bridge (``backend.py``) feeding a Three.js/Vite point renderer
(``main.js``: parses ``[N*3 float32 xyz ⧺ N*3 uint8 rgb]`` buffers, scales
points by 0.006, orbit controls). Node/npm aren't part of this environment,
so the frontend is a single dependency-free WebGL page (same wire format,
same 0.006 scale, drag-orbit + wheel-zoom) served by a stdlib HTTP server.
"""

from __future__ import annotations

import asyncio
import http.server
import socketserver
import threading
from typing import Optional

from pct.config import Config
from pct.streaming.transport import PullSocket

_PAGE = """<!DOCTYPE html>
<html><head><title>pct viewer</title><style>
html,body{margin:0;height:100%;background:#000;overflow:hidden}</style></head>
<body><canvas id="c"></canvas><script>
const canvas = document.getElementById('c');
const gl = canvas.getContext('webgl');
const vs = `attribute vec3 p; attribute vec3 col; uniform mat4 mvp;
varying vec3 vc; void main(){ gl_Position = mvp*vec4(p,1.0);
gl_PointSize = 2.0; vc = col; }`;
const fs = `precision mediump float; varying vec3 vc;
void main(){ gl_FragColor = vec4(vc,1.0); }`;
function sh(t,s){const x=gl.createShader(t);gl.shaderSource(x,s);gl.compileShader(x);return x;}
const prog = gl.createProgram();
gl.attachShader(prog, sh(gl.VERTEX_SHADER, vs));
gl.attachShader(prog, sh(gl.FRAGMENT_SHADER, fs));
gl.linkProgram(prog); gl.useProgram(prog);
const pBuf = gl.createBuffer(), cBuf = gl.createBuffer();
const locP = gl.getAttribLocation(prog,'p'), locC = gl.getAttribLocation(prog,'col');
const locMVP = gl.getUniformLocation(prog,'mvp');
let n = 0, center = null, theta = 0.5, phi = 0.4, dist = 3.0;
const SCALE = 0.006;  // reference main.js:67
function resize(){canvas.width=innerWidth;canvas.height=innerHeight;
gl.viewport(0,0,canvas.width,canvas.height);}
addEventListener('resize', resize); resize();
let drag=false,lx=0,ly=0;
canvas.onmousedown=e=>{drag=true;lx=e.clientX;ly=e.clientY};
onmouseup=()=>drag=false;
onmousemove=e=>{if(!drag)return;theta+=(e.clientX-lx)*.01;phi+=(e.clientY-ly)*.01;
phi=Math.max(-1.5,Math.min(1.5,phi));lx=e.clientX;ly=e.clientY;};
canvas.onwheel=e=>{dist*=Math.pow(1.1,Math.sign(e.deltaY));e.preventDefault();};
function mat(){
  const a=canvas.width/canvas.height, f=1/Math.tan(0.4), near=0.01, far=100;
  const eye=[dist*Math.cos(phi)*Math.sin(theta), dist*Math.sin(phi),
             dist*Math.cos(phi)*Math.cos(theta)];
  const z=norm(eye), x=norm(cross([0,1,0],z)), y=cross(z,x);
  const v=[x[0],y[0],z[0],0, x[1],y[1],z[1],0, x[2],y[2],z[2],0,
    -dot(x,eye),-dot(y,eye),-dot(z,eye),1];
  const p=[f/a,0,0,0, 0,f,0,0, 0,0,(far+near)/(near-far),-1,
    0,0,2*far*near/(near-far),0];
  return mul(p,v);
  function norm(v){const l=Math.hypot(...v);return v.map(x=>x/l);}
  function cross(a,b){return [a[1]*b[2]-a[2]*b[1],a[2]*b[0]-a[0]*b[2],a[0]*b[1]-a[1]*b[0]];}
  function dot(a,b){return a[0]*b[0]+a[1]*b[1]+a[2]*b[2];}
  function mul(a,b){const o=new Array(16).fill(0);
    for(let i=0;i<4;i++)for(let j=0;j<4;j++)for(let k=0;k<4;k++)
      o[j*4+i]+=a[k*4+i]*b[j*4+k]; return o;}
}
function render(){
  gl.clearColor(0,0,0,1); gl.clear(gl.COLOR_BUFFER_BIT|gl.DEPTH_BUFFER_BIT);
  gl.enable(gl.DEPTH_TEST);
  if(n>0){
    gl.bindBuffer(gl.ARRAY_BUFFER,pBuf); gl.enableVertexAttribArray(locP);
    gl.vertexAttribPointer(locP,3,gl.FLOAT,false,0,0);
    gl.bindBuffer(gl.ARRAY_BUFFER,cBuf); gl.enableVertexAttribArray(locC);
    gl.vertexAttribPointer(locC,3,gl.UNSIGNED_BYTE,true,0,0);
    gl.uniformMatrix4fv(locMVP,false,new Float32Array(mat()));
    gl.drawArrays(gl.POINTS,0,n);
  }
  requestAnimationFrame(render);
}
render();
const ws = new WebSocket(`ws://${location.hostname}:%WSPORT%`);
ws.binaryType='arraybuffer';
ws.onmessage = ev => {
  const buf = ev.data; n = Math.floor(buf.byteLength/(12+3));
  let pts = new Float32Array(buf, 0, n*3);
  const cols = new Uint8Array(buf, n*12, n*3);
  const scaled = new Float32Array(n*3);
  if (center === null) {  // one-time centering (reference main.js:100-115)
    center=[0,0,0];
    for(let i=0;i<n;i++){center[0]+=pts[i*3];center[1]+=pts[i*3+1];center[2]+=pts[i*3+2];}
    center=center.map(c=>c/n*SCALE);
  }
  for(let i=0;i<n*3;i++) scaled[i]=pts[i]*SCALE-center[i%3];
  gl.bindBuffer(gl.ARRAY_BUFFER,pBuf);
  gl.bufferData(gl.ARRAY_BUFFER,scaled,gl.DYNAMIC_DRAW);
  gl.bindBuffer(gl.ARRAY_BUFFER,cBuf);
  gl.bufferData(gl.ARRAY_BUFFER,cols,gl.DYNAMIC_DRAW);
};
</script></body></html>"""


class VisualizerBackend:
    """Pull frames from the client and fan out to WebSocket viewers
    (reference ``visualizer/backend.py``)."""

    def __init__(self, config: Optional[Config] = None):
        self.config = config or Config.load()
        self.ws_port = int(self.config.get("websocket_port", 8765))
        self.http_port = int(self.config.get("visualizer_http_port", 5173))
        self.pull = PullSocket(self.config["visualizer_address"])
        self._clients: set = set()

    async def _handler(self, websocket):
        self._clients.add(websocket)
        try:
            await websocket.wait_closed()
        finally:
            self._clients.discard(websocket)

    def _recv_bounded(self):
        # bounded recv: run_in_executor threads are non-daemon, so an
        # unbounded blocking recv would hang interpreter shutdown
        try:
            return self.pull.recv(timeout=1.0)
        except (TimeoutError, RuntimeError):  # RuntimeError: interpreter exit
            return None

    async def _pump(self):
        loop = asyncio.get_running_loop()
        while True:
            try:
                msg = await loop.run_in_executor(None, self._recv_bounded)
            except RuntimeError:  # executor torn down at interpreter exit
                return
            if msg is None:
                continue
            buf = bytes(msg["frame"])
            dead = []
            for ws in self._clients:
                try:
                    await ws.send(buf)
                except Exception:
                    dead.append(ws)
            for ws in dead:
                self._clients.discard(ws)

    def _serve_page(self):
        page = _PAGE.replace("%WSPORT%", str(self.ws_port)).encode()

        class Handler(http.server.BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def do_GET(self):
                self.send_response(200)
                self.send_header("Content-Type", "text/html")
                self.send_header("Content-Length", str(len(page)))
                self.end_headers()
                self.wfile.write(page)

        socketserver.ThreadingTCPServer.allow_reuse_address = True
        httpd = socketserver.ThreadingTCPServer(("0.0.0.0", self.http_port), Handler)
        httpd.daemon_threads = True
        threading.Thread(target=httpd.serve_forever, daemon=True).start()

    async def main(self):
        import websockets

        self._serve_page()
        async with websockets.serve(self._handler, "0.0.0.0", self.ws_port):
            await self._pump()

    def run(self):
        asyncio.run(self.main())


if __name__ == "__main__":
    import sys

    VisualizerBackend(Config.load(sys.argv[1] if len(sys.argv) > 1 else None)).run()
