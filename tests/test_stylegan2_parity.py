"""StyleGAN2 generator parity vs an independent torch implementation of the
public rosinality architecture (subprocess, single-device CPU — see
psp_parity_check.py for why). Verifies synthesis (w+ path with stored
noises), the mapping MLP, and the z path after weight conversion."""

import os
import subprocess
import sys


class TestStyleGAN2Parity:
    def test_parity_subprocess(self):
        script = os.path.join(os.path.dirname(__file__),
                              "stylegan2_parity_check.py")
        from tests.env_utils import cpu_env

        env = cpu_env()
        result = subprocess.run(
            [sys.executable, script], env=env,
            capture_output=True, text=True, timeout=560,
        )
        assert result.returncode == 0, (
            f"parity check failed:\n{result.stdout}\n{result.stderr}"
        )
        assert "STYLEGAN2_PARITY_OK" in result.stdout
        print(result.stdout)
