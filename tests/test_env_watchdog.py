"""Unit tests for the tunnel-outage hardening utilities
(tests/env_utils + fer_vit_tpu.utils.watchdog)."""

import os
import subprocess
import sys
import time

from tests.env_utils import FAKE_MODULE_NAMES, cpu_env, strip_axon_site

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class TestStripAxonSite:
    def test_drops_axon_entries_keeps_rest(self):
        pp = os.pathsep.join(["/a/b", "/root/.axon_site", "/c"])
        assert strip_axon_site(pp) == os.pathsep.join(["/a/b", "/c"])

    def test_empty_and_none(self):
        assert strip_axon_site("") == ""
        assert strip_axon_site(None) == ""


class TestCpuEnv:
    def test_forces_cpu_and_strips_tunnel(self):
        env = cpu_env("/repo")
        assert env["JAX_PLATFORMS"] == "cpu"
        assert env["JAX_PLATFORM_NAME"] == "cpu"
        assert ".axon_site" not in env.get("PYTHONPATH", "")
        assert env["PYTHONPATH"].split(os.pathsep)[0] == "/repo"
        assert "XLA_FLAGS" not in env

    def test_xla_flags_override(self):
        env = cpu_env(xla_flags="--xla_force_host_platform_device_count=8")
        assert env["XLA_FLAGS"] == "--xla_force_host_platform_device_count=8"

    def test_fake_module_names_cover_installers(self):
        """Every name the stub installers register must be restorable by
        the conftest leak guard."""
        import ast

        src = open(os.path.join(REPO, "tests", "torch_refs_aux.py")).read()
        registered = {
            node.args[0].value
            for node in ast.walk(ast.parse(src))
            if isinstance(node, ast.Call)
            and getattr(node.func, "id", "") == "_register"
            and node.args and isinstance(node.args[0], ast.Constant)
        }
        assert registered, "no _register calls found?"
        assert registered <= set(FAKE_MODULE_NAMES), (
            registered - set(FAKE_MODULE_NAMES))


class TestWatchdog:
    def test_cancel_prevents_abort(self):
        from fer_vit_tpu.utils.watchdog import arm_device_init_watchdog

        t = arm_device_init_watchdog(seconds=1)
        t.cancel()
        time.sleep(1.2)  # would have fired (and os._exit'd) by now

    def test_fires_and_exits_2(self):
        code = (
            "import time\n"
            "from fer_vit_tpu.utils.watchdog import "
            "arm_device_init_watchdog\n"
            "arm_device_init_watchdog(seconds=1)\n"
            "time.sleep(10)\n"
        )
        r = subprocess.run([sys.executable, "-c", code], env=cpu_env(REPO),
                           capture_output=True, text=True, timeout=30)
        assert r.returncode == 2
        assert "watchdog" in r.stderr
