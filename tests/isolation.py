"""Fresh-interpreter isolation for compile-heavy tests.

XLA:CPU's LLVM JIT segfaults once enough compiled executables accumulate
in a single process (SIGSEGV inside ``backend_compile_and_load`` on a
module that passes standalone; reproduced 3/3 at
``test_mla_draft_model_speculation`` after ~270 prior compilations —
VERDICT r4).  The module-scope ``jax.clear_caches()`` in conftest bounds
the population between modules but cannot help a single module that
itself compiles hundreds of programs.  ``@isolated`` re-runs the test in
a child interpreter (same pytest node id), so its compilations land in a
fresh LLVM JIT; the parent test passes iff the child's pytest run does.

The child inherits the environment plus ``QUANT_TPU_ISOLATED_CHILD=1``;
inside the child the decorator is a no-op, so the real body runs exactly
once.  Only use on tests without function arguments/fixtures — the node
id is rebuilt from the module file + function name.
"""

import functools
import os
import subprocess
import sys

_CHILD_ENV = "QUANT_TPU_ISOLATED_CHILD"
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def isolated(fn):
    """Run the decorated test's body in a fresh interpreter."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        if os.environ.get(_CHILD_ENV) == "1":
            return fn(*args, **kwargs)
        test_file = os.path.relpath(fn.__globals__["__file__"], _REPO)
        nodeid = f"{test_file}::{fn.__name__}"
        env = dict(os.environ)
        env[_CHILD_ENV] = "1"
        proc = subprocess.run(
            [sys.executable, "-m", "pytest", "-q", "-x",
             "-p", "no:cacheprovider", nodeid],
            env=env, cwd=_REPO, capture_output=True, text=True,
        )
        if proc.returncode != 0:
            raise AssertionError(
                f"isolated child run of {nodeid} failed "
                f"(rc={proc.returncode}):\n{proc.stdout}\n{proc.stderr}"
            )

    return wrapper
