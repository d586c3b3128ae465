"""One-shot end-of-round validation of the driver deliverables.

Runs, each in its own bounded subprocess (so a hung relay can't eat the
round):
  1. ``entry()`` jit-compile + execute (single chip / ambient backend)
  2. ``dryrun_multichip(8)`` (virtual-CPU mesh; subprocess bootstrap)
  3. ``bench.py`` (must print a parseable JSON line)

Usage: python tools/validate_deliverables.py
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(name, code_or_cmd, timeout, is_cmd=False):
    cmd = code_or_cmd if is_cmd else [sys.executable, "-c", code_or_cmd]
    try:
        p = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True,
                           timeout=timeout)
    except subprocess.TimeoutExpired:
        print(f"[FAIL] {name}: timed out after {timeout}s")
        return False, ""
    ok = p.returncode == 0
    tail = (p.stdout or "").strip().splitlines()[-1:] or [""]
    err = (p.stderr or "").strip().splitlines()[-1:] or [""]
    print(f"[{'ok' if ok else 'FAIL'}] {name}: {tail[0][:200]}"
          + ("" if ok else f" | {err[0][:200]}"))
    return ok, p.stdout or ""


def main():
    ok1, _ = run(
        "entry()",
        "import sys; sys.path.insert(0, %r); import jax; "
        "from __graft_entry__ import entry; fn, args = entry(); "
        "out = jax.jit(fn)(*args); "
        "print('entry ok', out.shape, float(out.ravel()[0]))" % REPO,
        600)
    ok2, _ = run(
        "dryrun_multichip(8)",
        "import sys; sys.path.insert(0, %r); "
        "from __graft_entry__ import dryrun_multichip; "
        "dryrun_multichip(8); print('multichip ok')" % REPO,
        600)
    ok3, out = run("bench.py", [sys.executable, os.path.join(REPO, "bench.py")],
                   600, is_cmd=True)
    if ok3:
        try:
            parsed = json.loads(out.strip().splitlines()[-1])
            ok3 = parsed.get("value", 0) > 0
            if not ok3:
                print(f"[FAIL] bench.py value is {parsed.get('value')}"
                      f" (error: {parsed.get('error')})")
        except Exception as e:
            ok3 = False
            print(f"[FAIL] bench.py output unparseable: {e}")
    print("ALL DELIVERABLES OK" if ok1 and ok2 and ok3 else "DELIVERABLES FAILED")
    return 0 if (ok1 and ok2 and ok3) else 1


if __name__ == "__main__":
    sys.exit(main())
