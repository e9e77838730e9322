"""Page allocator: ctypes binding to the C++ runtime (csrc/page_allocator.cc)
with a pure-Python fallback so the framework runs from a clean checkout.

(The reference's native extension can never be imported from a clean checkout
because its build system is gitignored — SURVEY.md §1-L1. Here the build is
one ``make -C csrc`` and the fallback keeps tests green without it.)
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

_NATIVE_DIR = Path(__file__).resolve().parent.parent / "_native"
_LIB_PATH = _NATIVE_DIR / "libfat_runtime.so"
_CSRC = Path(__file__).resolve().parent.parent.parent / "csrc"


def _load_native(build_if_missing: bool = True, allow_rebuild: bool = True):
    if not _LIB_PATH.exists() and build_if_missing and _CSRC.exists():
        try:
            subprocess.run(
                ["make", "-C", str(_CSRC)],
                check=True, capture_output=True, timeout=120,
            )
        except (subprocess.SubprocessError, OSError):
            return None
    if not _LIB_PATH.exists():
        return None
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.fat_allocator_create.restype = ctypes.c_void_p
    lib.fat_allocator_create.argtypes = [ctypes.c_int64]
    lib.fat_allocator_destroy.argtypes = [ctypes.c_void_p]
    lib.fat_allocator_free_pages.restype = ctypes.c_int64
    lib.fat_allocator_free_pages.argtypes = [ctypes.c_void_p]
    lib.fat_allocator_grow.restype = ctypes.c_int32
    lib.fat_allocator_grow.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64
    ]
    lib.fat_allocator_get_pages.restype = ctypes.c_int64
    lib.fat_allocator_get_pages.argtypes = [
        ctypes.c_void_p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
    ]
    lib.fat_allocator_release.restype = ctypes.c_int64
    lib.fat_allocator_release.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    try:
        lib.fat_allocator_release_prefix.restype = ctypes.c_int64
        lib.fat_allocator_release_prefix.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64
        ]
        lib.fat_allocator_release_range.restype = ctypes.c_int64
        lib.fat_allocator_release_range.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64
        ]
        lib.fat_allocator_adopt.restype = ctypes.c_int32
        lib.fat_allocator_adopt.argtypes = [
            ctypes.c_void_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
        ]
        for name in ("pin", "unpin", "refcount"):
            fn = getattr(lib, f"fat_allocator_{name}")
            fn.restype = ctypes.c_int32
            fn.argtypes = [ctypes.c_void_p, ctypes.c_int32]
    except AttributeError:
        # Stale .so from before the newer symbols existed: rebuild ONCE
        # (allow_rebuild=False on the retry — if the relinked library
        # still lacks the symbols, fall back to Python rather than loop).
        if not allow_rebuild:
            return None
        try:
            subprocess.run(
                ["make", "-C", str(_CSRC), "clean", "all"],
                check=True, capture_output=True, timeout=120,
            )
            return _load_native(build_if_missing=False, allow_rebuild=False)
        except (subprocess.SubprocessError, OSError):
            return None
    return lib


_LIB = None
_LIB_TRIED = False


def _get_lib():
    global _LIB, _LIB_TRIED
    if not _LIB_TRIED:
        _LIB_TRIED = True
        if os.environ.get("FAT_DISABLE_NATIVE") != "1":
            _LIB = _load_native()
    return _LIB


class PageAllocator:
    """Free-list page allocator with per-sequence page chains.

    grow() is all-or-nothing: a continuous-batching step either fully
    schedules a sequence's growth or leaves it untouched.
    """

    def __init__(self, num_pages: int, *, native: bool | None = None):
        self.num_pages = num_pages
        lib = _get_lib() if native in (None, True) else None
        if native is True and lib is None:
            raise RuntimeError("native allocator requested but not buildable")
        self._lib = lib
        if lib is not None:
            self._handle = lib.fat_allocator_create(num_pages)
        else:
            self._free = list(range(num_pages - 1, -1, -1))
            self._seq_pages: dict[int, list[int]] = {}
            self._refcnt = [0] * num_pages

    @property
    def is_native(self) -> bool:
        return self._lib is not None

    def free_pages(self) -> int:
        if self._lib:
            return self._lib.fat_allocator_free_pages(self._handle)
        return len(self._free)

    def grow(self, seq_id: int, num_pages: int) -> bool:
        """Ensure seq owns >= num_pages pages. False if out of memory."""
        if self._lib:
            return self._lib.fat_allocator_grow(self._handle, seq_id, num_pages) == 0
        chain = self._seq_pages.setdefault(seq_id, [])
        need = num_pages - len(chain)
        if need <= 0:
            return True
        if len(self._free) < need:
            return False
        for _ in range(need):
            p = self._free.pop()
            self._refcnt[p] = 1
            chain.append(p)
        return True

    def adopt(self, seq_id: int, pages: list[int]) -> bool:
        """Append EXISTING pages (a shared prompt prefix) to seq's chain,
        taking one reference each. False if any page is free/out of range
        (adopting a free page would alias future allocations)."""
        if self._lib:
            arr = (ctypes.c_int32 * len(pages))(*pages)
            return self._lib.fat_allocator_adopt(
                self._handle, seq_id, arr, len(pages)
            ) == 0
        if any(
            p < 0 or p >= self.num_pages or self._refcnt[p] <= 0
            for p in pages
        ):
            return False
        chain = self._seq_pages.setdefault(seq_id, [])
        for p in pages:
            self._refcnt[p] += 1
            chain.append(p)
        return True

    def pin(self, page: int) -> int:
        """Chain-independent reference (the prefix cache's hold). Returns
        the new refcount, or -1 for an invalid/free page."""
        if self._lib:
            return self._lib.fat_allocator_pin(self._handle, page)
        if page < 0 or page >= self.num_pages or self._refcnt[page] <= 0:
            return -1
        self._refcnt[page] += 1
        return self._refcnt[page]

    def unpin(self, page: int) -> int:
        """Drop one reference; frees the page at zero. Returns the new
        refcount (0 = freed), or -1 for an invalid/free page."""
        if self._lib:
            return self._lib.fat_allocator_unpin(self._handle, page)
        if page < 0 or page >= self.num_pages or self._refcnt[page] <= 0:
            return -1
        return self._drop_ref(page)

    def refcount(self, page: int) -> int:
        if self._lib:
            return self._lib.fat_allocator_refcount(self._handle, page)
        if page < 0 or page >= self.num_pages:
            return -1
        return self._refcnt[page]

    def _drop_ref(self, page: int) -> int:
        self._refcnt[page] -= 1
        if self._refcnt[page] <= 0:
            self._refcnt[page] = 0
            self._free.append(page)
        return self._refcnt[page]

    def pages(self, seq_id: int) -> list[int]:
        if self._lib:
            cap = self.num_pages
            buf = (ctypes.c_int32 * cap)()
            n = self._lib.fat_allocator_get_pages(self._handle, seq_id, buf, cap)
            if n < 0:
                raise KeyError(seq_id)
            return list(buf[: min(n, cap)])
        if seq_id not in self._seq_pages:
            raise KeyError(seq_id)
        return list(self._seq_pages[seq_id])

    def release(self, seq_id: int) -> int:
        if self._lib:
            return self._lib.fat_allocator_release(self._handle, seq_id)
        chain = self._seq_pages.pop(seq_id, [])
        for p in chain:
            self._drop_ref(p)
        return len(chain)

    def release_range(self, seq_id: int, start: int, n: int) -> int:
        """Free ``n`` pages of the chain starting at position ``start``
        (StreamingLLM: the band moves past pages while the sink pages at
        the chain head stay)."""
        if self._lib:
            return self._lib.fat_allocator_release_range(
                self._handle, seq_id, start, n
            )
        chain = self._seq_pages.get(seq_id)
        if not chain or n <= 0 or start < 0 or start >= len(chain):
            return 0
        m = min(n, len(chain) - start)
        for p_ in chain[start: start + m]:
            self._drop_ref(p_)
        del chain[start: start + m]
        return m

    def release_prefix(self, seq_id: int, n: int) -> int:
        """Free the first ``n`` pages of the sequence's chain (sliding-window
        serving: pages wholly below the attention band are dead). The caller
        tracks the logical offset — after this, chain position i holds
        logical page (total_freed + i)."""
        if self._lib:
            return self._lib.fat_allocator_release_prefix(
                self._handle, seq_id, n
            )
        chain = self._seq_pages.get(seq_id)
        if not chain or n <= 0:
            return 0
        m = min(n, len(chain))
        for p in chain[:m]:
            self._drop_ref(p)
        del chain[:m]
        return m

    def __del__(self):
        if getattr(self, "_lib", None) is not None:
            self._lib.fat_allocator_destroy(self._handle)
