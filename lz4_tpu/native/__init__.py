"""Native C++ tier: build pipeline + ctypes bindings (the JNI-equivalent)."""
