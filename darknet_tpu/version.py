"""Version constants.

The reference stamps `.weights` files with MAJOR/MINOR/PATCH ints generated
into `src/version.h` (reference `CMakeLists.txt:3-7`, version 0.2.5); the
loader only inspects `major/minor > 1000` to detect the ancient transposed
fully-connected format (reference `parser.cpp:1801-1802`).  We write the same
0.2.5 triple for byte-compatibility with upstream tooling.
"""

__version__ = "0.1.0"

# (major, minor, patch) written at the head of every .weights file.
WEIGHTS_VERSION = (0, 2, 5)
