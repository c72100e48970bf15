"""Build hook: compile the native host runtime alongside the Python
packages (configuration lives in pyproject.toml)."""

import subprocess
import sys

from setuptools import setup
from setuptools.command.build_py import build_py


class BuildWithNative(build_py):
    def run(self):
        try:
            subprocess.run(
                [sys.executable, "-c",
                 "from videoprocessingframework_tpu.io import build;"
                 "build.build()"],
                check=True,
            )
        except Exception as e:  # allow pure-python installs; built on import
            print(f"native build deferred to first import: {e}")
        super().run()


setup(cmdclass={"build_py": BuildWithNative})
