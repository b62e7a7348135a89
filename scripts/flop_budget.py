"""Analytic FLOP budget for the headline bench config (25f 576x1024, CFG pair).

Grounds PERF.md speed-of-light claims: UNet forward ~160 TFLOP/step, VAE
decode ~166 TFLOP -> bf16 single-chip SOL ~1.18 f/s on v5e (197 TFLOP/s).
Pure arithmetic from the model configs (no jax needed); block structure
mirrors tvi/models/unet_st.py and tvi/models/vae.py.
"""
# Analytic FLOP count: SVD UNet forward @ 576x1024, F=25, CFG pair B=2
B, F = 2, 25
H, W = 72, 128          # latent 576/8 x 1024/8
chans = [320, 640, 1280, 1280]
ctx_dim = 1024
layers_per_block = 2

def conv(ci, co, h, w, n, k=3):  # n = batch elems (B*F)
    return 2 * n * h * w * ci * co * k * k

def dense(tokens, ci, co):
    return 2 * tokens * ci * co

def attn(rows, s_q, s_k, d_total):
    # qk + pv
    return 2 * rows * s_q * s_k * d_total * 2

total = 0
detail = {}

def add(name, f):
    global total
    detail[name] = detail.get(name, 0) + f
    total += f

n = B * F
# conv_in 9->320
add("conv", conv(9, 320, H, W, n))

# resnet: GN,silu,conv1, temb proj, GN,silu,conv2 (+1x1 skip when ci!=co)
def resnet(ci, co, h, w):
    f = conv(ci, co, h, w, n) + conv(co, co, h, w, n)
    f += dense(n, 1280, co)  # time emb proj
    if ci != co:
        f += conv(ci, co, h, w, n, k=1)
    # temporal res block: 3d convs over frames (kernel (3,1,1)): 2 convs co->co
    f += 2 * (2 * n * h * w * co * co * 3)
    f += dense(n, 1280, co)
    return f

# transformer: proj_in, spatial block (self attn over h*w, cross to 2, FF x4), temporal block(ff_in, self over F, cross to 1, FF), proj_out
def transformer(c, h, w):
    s = h * w
    rows_sp = n          # B*F batches
    f = dense(n*s, c, c) * 2           # proj in/out
    # spatial self
    f += dense(n*s, c, c) * 4          # qkv + out
    f += attn(rows_sp, s, s, c)
    # spatial cross (2 tokens)
    f += dense(n*s, c, c) * 2          # q + out
    f += dense(n*2, ctx_dim, c) * 2    # k,v
    f += attn(rows_sp, s, 2, c)
    # spatial FF (GEGLU): c -> 8c, 4c -> c
    f += dense(n*s, c, 8*c) + dense(n*s, 4*c, c)
    # temporal: rows = B*s, seq F
    rows_t = B * s
    # ff_in
    f += dense(B*s*F, c, 8*c) + dense(B*s*F, 4*c, c)
    # self
    f += dense(B*s*F, c, c) * 4
    f += attn(rows_t, F, F, c)
    # cross (1 token)
    f += dense(B*s*F, c, c) * 2
    f += dense(B*1, ctx_dim, c) * 2
    f += attn(rows_t, F, 1, c)
    # FF
    f += dense(B*s*F, c, 8*c) + dense(B*s*F, 4*c, c)
    # time_pos_embed MLP: per B*F token
    f += dense(n, c, 4*c) + dense(n, 4*c, c)
    return f

h, w = H, W
# down blocks
for i, c in enumerate(chans):
    ci = chans[i-1] if i > 0 else 320
    for l in range(layers_per_block):
        cin = ci if l == 0 else c
        add("resnet", resnet(cin, c, h, w))
        if i < 3:  # CrossAttn blocks
            add(f"xf{c}_{h}x{w}", transformer(c, h, w))
    if i < 3:  # downsample
        add("conv", conv(c, c, h//2, w//2, n))
        h, w = h//2, w//2

# mid: resnet + transformer + resnet at 1280, h=9,w=16
add("resnet", resnet(1280, 1280, h, w))
add(f"xf1280_{h}x{w}", transformer(1280, h, w))
add("resnet", resnet(1280, 1280, h, w))

# up blocks: 3 resnets each, reversed; skip concat doubles cin
up_chans = [1280, 1280, 640, 320]
prev = 1280
for i, c in enumerate(up_chans):
    for l in range(3):
        # skip channels approximation: cin = prev + skip(c or next)
        cin = prev + c if l < 2 else prev + (up_chans[i+1] if i+1 < 4 else 320)
        add("resnet", resnet(cin, c, h, w))
        prev = c
        if i > 0:
            add(f"xf{c}_{h}x{w}", transformer(c, h, w))
    if i < 3:
        h, w = h*2, w*2
        add("conv", conv(c, c, h, w, n))

add("conv", conv(320, 4, H, W, n))

print(f"UNet fwd total: {total/1e12:.1f} TFLOP")
import collections
agg = collections.defaultdict(float)
for k, v in detail.items():
    agg[k.split('_')[0]] += v
for k, v in sorted(agg.items(), key=lambda x: -x[1]):
    print(f"  {k:12s} {v/1e12:7.2f} TFLOP")

# VAE decode: 25 frames at 576x1024 output
# decoder: conv_in 4->512 @72x128, mid(2 resnets+attn), up blocks 512,512,256,128 with 3 resnets each, upsample convs, conv_out
vf = 0
fr = 25
def vconv(ci, co, h, w, k=3):
    return 2 * fr * h * w * ci * co * k * k
h, w = 72, 128
vf += vconv(4, 512, h, w)
# mid: 2 resnets + attention (1 head d=512 over h*w)
vf += 2 * (vconv(512,512,h,w)*2)
vf += 2 * fr * (h*w)**2 * 512 * 2 + 4 * fr * h*w * 512 * 512
vchans = [512, 512, 256, 128]
prev = 512
for i, c in enumerate(vchans):
    for l in range(3):
        cin = prev if l == 0 else c
        vf += vconv(cin, c, h, w) * 2
        if cin != c: vf += vconv(cin, c, h, w, k=1)
        # temporal decoder: time_conv (3,1,1) per resnet? temporal decoder has conv3d mixing
        vf += 2 * fr * h * w * c * c * 3
        prev = c
    if i < 3:
        h, w = h*2, w*2
        vf += vconv(c, c, h, w)
vf += vconv(128, 3, h, w)
# time_conv_out 3d conv 3->3? negligible
print(f"VAE decode total: {vf/1e12:.1f} TFLOP")
print(f"SOL at 197 TFLOP/s bf16: step {total/197e12:.3f}s x25 = {25*total/197e12:.2f}s, decode {vf/197e12:.2f}s")
print(f"fps at SOL: {25/(25*total/197e12 + vf/197e12):.3f}")
