"""Dashboard GUI: live bandwidth/points/latency charts + quality override.

Reference: ``receiver/client/gui.py`` + ``static/`` — a Flask-SocketIO app
pushing 1 Hz ``update_data`` events into Chart.js charts, with quality
buttons POSTing ``fixed_quality``. Flask isn't part of this environment, so
the same dashboard is served by a stdlib threading HTTP server with a JSON
polling endpoint (functionally equivalent at 1 Hz) and a self-contained
Chart-less canvas page — zero external JS dependencies.
"""

from __future__ import annotations

import http.server
import json
import socketserver
import threading
import time
from typing import Optional

from pct.config import Config

_PAGE = """<!DOCTYPE html>
<html><head><title>pct dashboard</title><style>
body{font-family:monospace;background:#111;color:#eee;margin:20px}
canvas{background:#1b1b1b;border:1px solid #333;display:block;margin:8px 0}
button{margin:2px;padding:6px 12px;background:#333;color:#eee;border:1px solid #555;cursor:pointer}
button.active{background:#2a6}
</style></head><body>
<h2>pct streaming dashboard</h2>
<div id="qual"></div>
<div>bandwidth: <span id="bw">-</span> kbit/s | points: <span id="pts">-</span> |
 e2e latency: <span id="lat">-</span> ms</div>
<canvas id="bwc" width="900" height="160"></canvas>
<canvas id="latc" width="900" height="160"></canvas>
<div>encoder steps (s/segment)</div><canvas id="encc" width="900" height="160"></canvas>
<div id="encleg"></div>
<div>decoder steps (s/segment)</div><canvas id="decc" width="900" height="160"></canvas>
<div id="decleg"></div>
<script>
const hist = {bw: [], lat: [], enc: [], dec: []};
const COLORS = ['#2a6','#26a','#a62','#a26','#6a2','#62a','#aa4','#4aa'];
function drawStacked(c, rows, legendEl) {
  // rows: array of {step: seconds} dicts (one per segment, newest last)
  const ctx = c.getContext('2d'); ctx.clearRect(0,0,c.width,c.height);
  if (!rows.length) return;
  const steps = Object.keys(rows[rows.length-1]);
  const totals = rows.map(r => steps.reduce((s,k)=>s+(r[k]||0), 0));
  const max = Math.max(...totals) * 1.1 + 1e-9;
  const w = Math.max(2, Math.floor(c.width/rows.length));
  rows.forEach((r,i)=>{
    let y = c.height;
    steps.forEach((k,j)=>{
      const h = ((r[k]||0)/max)*c.height;
      ctx.fillStyle = COLORS[j % COLORS.length];
      ctx.fillRect(i*w, y-h, w-1, h); y -= h;
    });
  });
  ctx.fillStyle='#888'; ctx.fillText(max.toFixed(2)+'s', 4, 12);
  if (legendEl) legendEl.innerHTML = steps.map((k,j)=>
    `<span style="color:${COLORS[j % COLORS.length]}">&#9632; ${k}</span>`).join(' ');
}
function draw(c, data, color) {
  const ctx = c.getContext('2d'); ctx.clearRect(0,0,c.width,c.height);
  if (!data.length) return;
  const max = Math.max(...data) * 1.1 + 1e-9;
  ctx.strokeStyle = color; ctx.beginPath();
  data.forEach((v,i)=>{const x=i*c.width/Math.max(data.length-1,1),
    y=c.height-(v/max)*c.height; i?ctx.lineTo(x,y):ctx.moveTo(x,y);});
  ctx.stroke();
  ctx.fillStyle='#888'; ctx.fillText(max.toFixed(1), 4, 12);
}
async function tick() {
  try {
    const d = await (await fetch('/data')).json();
    document.getElementById('bw').textContent = (d.bandwidth/1000).toFixed(1);
    document.getElementById('pts').textContent = d.points;
    document.getElementById('lat').textContent = (d.latency*1000).toFixed(0);
    hist.bw.push(d.bandwidth/1000); hist.lat.push(d.latency*1000);
    hist.enc.push(d.encoder_latencies||{}); hist.dec.push(d.decoder_latencies||{});
    if (hist.bw.length>120){hist.bw.shift();hist.lat.shift();hist.enc.shift();hist.dec.shift();}
    draw(document.getElementById('bwc'), hist.bw, '#2a6');
    draw(document.getElementById('latc'), hist.lat, '#26a');
    drawStacked(document.getElementById('encc'), hist.enc, document.getElementById('encleg'));
    drawStacked(document.getElementById('decc'), hist.dec, document.getElementById('decleg'));
    const q = document.getElementById('qual');
    if (q.children.length != d.num_qualities) {
      q.innerHTML='quality: ';
      for (let i=0;i<d.num_qualities;i++){
        const b=document.createElement('button'); b.textContent='Q'+i;
        b.onclick=()=>fetch('/quality',{method:'POST',body:JSON.stringify({fixed_quality:i})});
        q.appendChild(b);
      }
    }
    [...q.getElementsByTagName('button')].forEach((b,i)=>b.classList.toggle('active', i==d.quality));
  } catch(e) {}
  setTimeout(tick, 1000);
}
tick();
</script></body></html>"""


class DashboardGUI:
    def __init__(self, config: Optional[Config] = None):
        self.config = config or Config.load()
        self.port = int(self.config.get("gui_port", 5000))
        self._stats = {
            "bandwidth": 0.0,
            "points": 0,
            "latency": 0.0,
            "quality": int(self.config.get("init_quality", 1)),
            "num_qualities": len(self.config.get("encoding_settings")) + 1,
            "encoder_latencies": {},
            "decoder_latencies": {},
        }
        self._client = None
        self.httpd = None

    def attach(self, client) -> None:
        self._client = client

    # called by the client's decoder_receiver (1 Hz effective)
    def update_stats(self, sideinfo: dict, frames: list) -> None:
        tm = sideinfo.get("time_measurements", {})
        etm = sideinfo.get("encoder_time_measurements", {})
        ts = sideinfo.get("timestamps", {})
        self._stats.update(
            {
                "bandwidth": sideinfo.get("num_bytes", 0)
                * 8
                / max(sideinfo.get("download_time", 1e-3), 1e-3),
                "points": int(sum(len(f["points"]) for f in frames)),
                "latency": max(
                    ts.get("client_playout_scheduled", 0) - ts.get("capturing", 0), 0.0
                )
                if ts.get("capturing")
                else 0.0,
                "quality": sideinfo.get("quality", self._stats["quality"]),
                "encoder_latencies": {k: float(v) for k, v in etm.items()},
                "decoder_latencies": {k: float(v) for k, v in tm.items()},
            }
        )

    def run(self) -> None:
        gui = self

        class Handler(http.server.BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def _send(self, code, body, ctype="application/json"):
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path == "/" or self.path.startswith("/index"):
                    self._send(200, _PAGE.encode(), "text/html")
                elif self.path == "/data":
                    self._send(200, json.dumps(gui._stats).encode())
                else:
                    self._send(404, b"{}")

            def do_POST(self):
                if self.path == "/quality":
                    n = int(self.headers.get("Content-Length", 0))
                    try:
                        q = int(json.loads(self.rfile.read(n))["fixed_quality"])
                        gui._stats["quality"] = q
                        if gui._client is not None:
                            gui._client.downloader.fixed_quality = q
                            gui._client.downloader.fixed_quality_mode = True
                        self._send(200, b"{}")
                    except Exception:
                        self._send(400, b"{}")
                else:
                    self._send(404, b"{}")

        socketserver.ThreadingTCPServer.allow_reuse_address = True
        self.httpd = socketserver.ThreadingTCPServer(("0.0.0.0", self.port), Handler)
        self.httpd.daemon_threads = True
        self.httpd.serve_forever()

    def start_background(self) -> None:
        threading.Thread(target=self.run, daemon=True).start()
        time.sleep(0.1)

    def stop(self):
        if self.httpd:
            self.httpd.shutdown()
