"""Native runtime: ctypes binding to the C++ host engine (libhevce_host.so)."""
