#!/usr/bin/env bash
tensorboard --logdir results/logs "$@"
