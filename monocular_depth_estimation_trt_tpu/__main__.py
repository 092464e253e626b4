from monocular_depth_estimation_trt_tpu.cli import main

if __name__ == "__main__":
    raise SystemExit(main())
