"""The two driver deliverables must be unkillable (VERDICT.md round 2).

- ``__graft_entry__.dryrun_multichip``'s parent path must make ZERO jax
  backend contact: the re-exec decision comes from env vars alone.
- ``bench.py``'s parent must never import jax and must print a parseable
  JSON line even when every benchmark attempt fails.
"""

import importlib
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO) if REPO not in sys.path else None

import __graft_entry__ as graft  # noqa: E402


# ------------------------------------------------------- dryrun_multichip --

def test_cpu_mesh_env_ready_detects_driver_env(monkeypatch):
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    monkeypatch.setenv("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
    assert graft._cpu_mesh_env_ready(8)
    assert graft._cpu_mesh_env_ready(4)
    assert not graft._cpu_mesh_env_ready(16)


@pytest.mark.parametrize(
    "platforms,flags",
    [
        ("", ""),
        ("tpu", "--xla_force_host_platform_device_count=8"),
        ("cpu", ""),
        ("cpu", "--xla_force_host_platform_device_count=2"),
        ("tpu,cpu", "--xla_force_host_platform_device_count=8"),
    ],
)
def test_cpu_mesh_env_not_ready(monkeypatch, platforms, flags):
    monkeypatch.setenv("JAX_PLATFORMS", platforms)
    monkeypatch.setenv("XLA_FLAGS", flags)
    assert not graft._cpu_mesh_env_ready(8)


def test_cpu_mesh_env_not_ready_under_axon_hijack(monkeypatch):
    """Round-3 postmortem: with PALLAS_AXON_POOL_IPS set, the container
    sitecustomize hijacks backend selection even under JAX_PLATFORMS=cpu
    (the process gets a 1-device TPU backend).  The env check must treat
    that as not-ready so the subprocess bootstrap (which clears the var)
    is taken."""
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    monkeypatch.setenv("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
    monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "127.0.0.1")
    assert not graft._cpu_mesh_env_ready(8)


def test_axon_hijack_env_goes_to_bootstrap(monkeypatch):
    monkeypatch.delenv("_CVT_MULTICHIP_REEXEC", raising=False)
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    monkeypatch.setenv("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
    monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "127.0.0.1")
    calls = []
    monkeypatch.setattr(graft, "_bootstrap_multichip_subprocess", lambda n: calls.append(n))
    monkeypatch.setattr(
        graft, "_dryrun_multichip_impl",
        lambda n: (_ for _ in ()).throw(AssertionError("impl ran in hijacked env")),
    )
    graft.dryrun_multichip(8)
    assert calls == [8]


def test_parent_path_makes_no_jax_contact(monkeypatch):
    """With no re-exec marker and no CPU-mesh env, dryrun_multichip must go
    straight to the subprocess bootstrap without touching jax."""
    monkeypatch.delenv("_CVT_MULTICHIP_REEXEC", raising=False)
    monkeypatch.setenv("JAX_PLATFORMS", "")  # a TPU-default parent
    monkeypatch.setenv("XLA_FLAGS", "")

    calls = []
    monkeypatch.setattr(graft, "_bootstrap_multichip_subprocess", lambda n: calls.append(n))

    def _boom(*a, **k):  # any backend contact fails the test
        raise AssertionError("parent path touched the jax backend")

    import jax

    monkeypatch.setattr(jax, "devices", _boom)
    monkeypatch.setattr(jax, "local_devices", _boom)
    monkeypatch.setattr(graft, "_dryrun_multichip_impl", _boom)

    graft.dryrun_multichip(8)
    assert calls == [8]


def test_parent_module_has_no_toplevel_jax_dependency():
    """The module must be importable and decide to bootstrap in a process
    where importing jax is impossible (simulated via a poisoned import)."""
    code = (
        "import sys, types\n"
        "class _Poison:\n"
        "    def find_module(self, name, path=None):\n"
        "        if name == 'jax' or name.startswith('jax.'):\n"
        "            raise AssertionError('parent imported jax')\n"
        "sys.meta_path.insert(0, _Poison())\n"
        f"sys.path.insert(0, {REPO!r})\n"
        "import __graft_entry__ as g\n"
        "import os\n"
        "os.environ.pop('_CVT_MULTICHIP_REEXEC', None)\n"
        "os.environ['JAX_PLATFORMS'] = ''\n"
        "g._bootstrap_multichip_subprocess = lambda n: print('BOOTSTRAP', n)\n"
        "g.dryrun_multichip(8)\n"
    )
    env = {k: v for k, v in os.environ.items()}
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, env=env, timeout=120
    )
    assert proc.returncode == 0, proc.stderr
    assert "BOOTSTRAP 8" in proc.stdout


def test_reexec_marker_runs_impl_in_process(monkeypatch):
    monkeypatch.setenv("_CVT_MULTICHIP_REEXEC", "1")
    ran = []
    monkeypatch.setattr(graft, "_dryrun_multichip_impl", lambda n: ran.append(n))
    monkeypatch.setattr(
        graft, "_bootstrap_multichip_subprocess",
        lambda n: (_ for _ in ()).throw(AssertionError("re-exec path re-bootstrapped")),
    )
    graft.dryrun_multichip(8)
    assert ran == [8]


# ------------------------------------------------------------------ bench --

def _load_bench():
    spec = importlib.util.spec_from_file_location("bench", os.path.join(REPO, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_bench_parse_json_line():
    bench = _load_bench()
    noise = "WARNING: platform axon is experimental\n{not json}\n"
    good = '{"metric": "canny_1080p_gpix_s", "value": 6.8, "unit": "GPix/s", "vs_baseline": 3.4}'
    assert bench._parse_json_line(noise + good + "\ntrailing")["value"] == 6.8
    assert bench._parse_json_line(noise) is None
    assert bench._parse_json_line("") is None


def test_bench_emits_error_json_on_double_failure(monkeypatch, capsys):
    bench = _load_bench()
    monkeypatch.setattr(bench, "_run_child", lambda i, b, t: (None, "simulated relay hang"))
    bench.main()
    line = capsys.readouterr().out.strip().splitlines()[-1]
    obj = json.loads(line)
    assert obj["metric"] == "canny_1080p_gpix_s"
    assert obj["value"] == 0.0
    assert "simulated relay hang" in obj["error"]


def test_bench_prints_child_result_verbatim(monkeypatch, capsys):
    bench = _load_bench()
    payload = {"metric": "canny_1080p_gpix_s", "value": 6.5, "unit": "GPix/s", "vs_baseline": 3.25}
    monkeypatch.setattr(bench, "_run_child", lambda i, b, t: (dict(payload), None))
    bench.main()
    line = capsys.readouterr().out.strip().splitlines()[-1]
    assert json.loads(line) == payload


def test_bench_parent_never_imports_jax():
    """Run bench.py under a poisoned-jax interpreter with a stub child: the
    parent must still produce the child's JSON line."""
    code = (
        "import sys\n"
        "class _Poison:\n"
        "    def find_module(self, name, path=None):\n"
        "        if name == 'jax' or name.startswith('jax.'):\n"
        "            raise AssertionError('bench parent imported jax')\n"
        "sys.meta_path.insert(0, _Poison())\n"
        "import importlib.util, json\n"
        f"spec = importlib.util.spec_from_file_location('bench', {os.path.join(REPO, 'bench.py')!r})\n"
        "bench = importlib.util.module_from_spec(spec)\n"
        "spec.loader.exec_module(bench)\n"
        "payload = {'metric': 'canny_1080p_gpix_s', 'value': 1.0, 'unit': 'GPix/s', 'vs_baseline': 0.5}\n"
        "bench._run_child = lambda i, b, t: (payload, None)\n"
        "bench.main()\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=120
    )
    assert proc.returncode == 0, proc.stderr
    assert json.loads(proc.stdout.strip().splitlines()[-1])["value"] == 1.0
