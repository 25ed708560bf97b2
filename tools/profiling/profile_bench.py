import sys, runpy
import rawhash_tpu.map.engine as eng
orig_main = None
sys.argv = ["bench.py"]
import os, sys as _s; _s.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
import bench
# monkeypatch: print profiler at end
m = bench.main
def main2():
    import rawhash_tpu.map.engine as E
    old_init = E.MappingEngine.__init__
    engines = []
    def init2(self, *a, **k):
        old_init(self, *a, **k)
        engines.append(self)
    E.MappingEngine.__init__ = init2
    m()
    for e in engines:
        print("# PROFILE:", e.profiler.summary(), file=sys.stderr)
main2()
