// stub: compression filters unused (HAVE_LIBZ undefined in shim build)
