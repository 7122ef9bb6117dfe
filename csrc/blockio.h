// C ABI of the tpu-audio native runtime (csrc/blockio.cpp).
// Consumed by ctypes (tpu_audio/runtime/native.py) and by the native
// JACK bridge executable (csrc/jackbridge.cpp).
#pragma once
#include <stdint.h>

#ifdef __cplusplus
extern "C" {
#endif

typedef struct ta_ring ta_ring;

ta_ring* ta_ring_create(uint64_t capacity, const char* shm_name);
ta_ring* ta_ring_open(const char* shm_name);
void ta_ring_destroy(ta_ring* r, const char* unlink_name);
uint64_t ta_ring_capacity(const ta_ring* r);
uint64_t ta_ring_readable(const ta_ring* r);
uint64_t ta_ring_writable(const ta_ring* r);
uint64_t ta_ring_write(ta_ring* r, const float* src, uint64_t n);
uint64_t ta_ring_read(ta_ring* r, float* dst, uint64_t n);

typedef struct ta_clock ta_clock;

ta_clock* ta_clock_create(uint64_t period_ns);
int64_t ta_clock_wait(ta_clock* c);
uint64_t ta_clock_missed(const ta_clock* c);
uint64_t ta_clock_ticks(const ta_clock* c);
void ta_clock_destroy(ta_clock* c);

typedef struct ta_midi ta_midi;

ta_midi* ta_midi_create();
void ta_midi_destroy(ta_midi* m);
uint32_t ta_midi_feed(ta_midi* m, const uint8_t* data, uint32_t n,
                      uint8_t* out, uint32_t out_cap);

#ifdef __cplusplus
}  // extern "C"
#endif
