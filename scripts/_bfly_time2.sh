#!/bin/bash
timeout 580 python scripts/_bfly_time.py "$@" 2>&1 | grep -v WARNING | tail -1
