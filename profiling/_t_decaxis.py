from bench_decode import bench_decode_device_mpps
print("decode_device_mpps:", bench_decode_device_mpps(), flush=True)
