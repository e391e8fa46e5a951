// Golden-vector generator. Includes the reference encoder translation unit and
// drives its internal functions to dump input/output pairs as raw binary.
// This file lives OUTSIDE the rebuilt repo; only the generated .npz data is committed.
#include "HEVCe.c"
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

static unsigned long long rng_state = 0x9E3779B97F4A7C15ull;
static unsigned int xrand(void) {
    rng_state ^= rng_state << 13; rng_state ^= rng_state >> 7; rng_state ^= rng_state << 17;
    return (unsigned int)(rng_state >> 32);
}

static void wi32(FILE*f, const I32*p, int n){ fwrite(p, 4, n, f); }
static void wu8 (FILE*f, const UI8*p, int n){ fwrite(p, 1, n, f); }
static void w1(FILE*f, I32 v){ fwrite(&v,4,1,f); }

// ---------------- getBorder vectors ----------------
static void gen_border(const char*path){
    FILE*f=fopen(path,"wb");
    static UI8 base[1+64][1+CTU_SZ*2];
    const I32 sizes[4]={4,8,16,32};
    int t, s, fl, i, j;
    int ntest = 0;
    for (s=0;s<4;s++) for (fl=0;fl<16;fl++) for (t=0;t<4;t++) ntest++;
    w1(f, ntest);
    for (s=0;s<4;s++) for (fl=0;fl<16;fl++) for (t=0;t<4;t++){
        I32 sz=sizes[s];
        for(i=0;i<1+64;i++) for(j=0;j<1+CTU_SZ*2;j++) base[i][j]=(UI8)xrand();
        UI8 (*rcon)[1+CTU_SZ*2] = (UI8(*)[1+CTU_SZ*2]) &base[1][1];
        UI8 ubla[1], ublb[CTU_SZ*2], ubar[CTU_SZ*2], fbla[1], fblb[CTU_SZ*2], fbar[CTU_SZ*2];
        memset(ublb,0,sizeof ublb); memset(ubar,0,sizeof ubar);
        memset(fblb,0,sizeof fblb); memset(fbar,0,sizeof fbar);
        getBorder(sz, fl&1, (fl>>1)&1, (fl>>2)&1, (fl>>3)&1, rcon, ubla, ublb, ubar, fbla, fblb, fbar);
        w1(f,sz); w1(f,fl&1); w1(f,(fl>>1)&1); w1(f,(fl>>2)&1); w1(f,(fl>>3)&1);
        wu8(f, &base[0][0], (1+64)*(1+CTU_SZ*2));
        wu8(f, ubla,1); wu8(f, ublb,CTU_SZ*2); wu8(f, ubar,CTU_SZ*2);
        wu8(f, fbla,1); wu8(f, fblb,CTU_SZ*2); wu8(f, fbar,CTU_SZ*2);
    }
    fclose(f);
}

// ---------------- predict vectors ----------------
static void gen_predict(const char*path){
    FILE*f=fopen(path,"wb");
    const I32 sizes[4]={4,8,16,32};
    int s,pm,t,i,j;
    int ntest=4*35*3;
    w1(f,ntest);
    for (s=0;s<4;s++) for (pm=0;pm<35;pm++) for(t=0;t<3;t++){
        I32 sz=sizes[s];
        UI8 ubla, ublb[CTU_SZ*2], ubar[CTU_SZ*2], fbla, fblb[CTU_SZ*2], fbar[CTU_SZ*2];
        static UI8 dst[CTU_SZ][CTU_SZ];
        ubla=(UI8)xrand(); fbla=(UI8)xrand();
        for(i=0;i<CTU_SZ*2;i++){ublb[i]=(UI8)xrand();ubar[i]=(UI8)xrand();fblb[i]=(UI8)xrand();fbar[i]=(UI8)xrand();}
        memset(dst,0,sizeof dst);
        predict(sz, CH_Y, pm, ubla, ublb, ubar, fbla, fblb, fbar, dst);
        w1(f,sz); w1(f,pm);
        wu8(f,&ubla,1); wu8(f,ublb,64); wu8(f,ubar,64); wu8(f,&fbla,1); wu8(f,fblb,64); wu8(f,fbar,64);
        for(i=0;i<sz;i++) wu8(f,dst[i],sz);
    }
    fclose(f);
}

// ---------------- transform vectors ----------------
static void gen_xform(const char*path){
    FILE*f=fopen(path,"wb");
    const I32 sizes[4]={4,8,16,32};
    int s,inv,t,i,j;
    int ntest=4*2*4;
    w1(f,ntest);
    for (s=0;s<4;s++) for (inv=0;inv<2;inv++) for(t=0;t<4;t++){
        I32 sz=sizes[s];
        static I32 src[CTU_SZ][CTU_SZ], dst[CTU_SZ][CTU_SZ];
        for(i=0;i<sz;i++) for(j=0;j<sz;j++){
            if (!inv) src[i][j] = (I32)(xrand()%511) - 255;          // residual range
            else      src[i][j] = (I32)(xrand()%65536) - 32768;      // coefficient range
        }
        transform(sz, inv, src, dst);
        w1(f,sz); w1(f,inv);
        for(i=0;i<sz;i++) wi32(f,src[i],sz);
        for(i=0;i<sz;i++) wi32(f,dst[i],sz);
    }
    fclose(f);
}

// ---------------- quant / dequant vectors ----------------
static void gen_quant(const char*path){
    FILE*f=fopen(path,"wb");
    const I32 sizes[4]={4,8,16,32};
    int s,q,t,i,j;
    int ntest=4*5*4;
    w1(f,ntest);
    for (s=0;s<4;s++) for (q=0;q<5;q++) for(t=0;t<4;t++){
        I32 sz=sizes[s];
        static I32 src[CTU_SZ][CTU_SZ], dst[CTU_SZ][CTU_SZ], dq[CTU_SZ][CTU_SZ];
        for(i=0;i<sz;i++) for(j=0;j<sz;j++){
            // mix of magnitudes incl. huge values to hit saturation paths
            unsigned r = xrand();
            I32 v = (I32)(r % 65536) - 32768;
            if ((r>>20)%8==0) v *= 4;            // exceed coef range sometimes (transform output is clipped but test robustness)
            if ((r>>23)%16==0) v = (I32)(r % 400000) - 200000;
            src[i][j]=v;
        }
        memset(dst,0,sizeof dst);
        quantize(q, sz, 0, src, dst);
        deQuantize(q, sz, dst, dq);
        w1(f,sz); w1(f,q);
        for(i=0;i<sz;i++) wi32(f,src[i],sz);
        for(i=0;i<sz;i++) wi32(f,dst[i],sz);
        for(i=0;i<sz;i++) wi32(f,dq[i],sz);
    }
    fclose(f);
}

// ---------------- scalar tables ----------------
static void gen_tables(const char*path){
    FILE*f=fopen(path,"wb");
    int i,q;
    for(i=0;i<256;i++) w1(f, estimateCoeffRate(i));
    for(q=0;q<5;q++) for(i=0;i<256;i++) w1(f, (I32)initContextValue((UI8)i, q));
    fclose(f);
}

// ---------------- CABAC op-trace vectors ----------------
// program: sequence of random ops applied to a fresh coder + fresh ctxs; after each op dump CABAClen.
static void gen_cabac(const char*path){
    FILE*f=fopen(path,"wb");
    int t, op;
    int ntest=8, nops=2000;
    w1(f,ntest); w1(f,nops);
    for(t=0;t<ntest;t++){
        CABACcoder c = newCABACcoder();
        ContextSet xs = newContextSet(t%5);
        UI8 *ctx = (UI8*)&xs;
        w1(f, t%5);
        for(op=0;op<nops;op++){
            unsigned r=xrand();
            I32 kind = r%16;
            if (kind<10){          // context-coded bin
                I32 ci = (r>>8)%142;
                I32 bin = (r>>16)&1;
                CABACputBin(&c, (BOOL)bin, &ctx[ci]);
                w1(f,0); w1(f,ci); w1(f,bin);
            } else if (kind<15){   // bypass bins
                I32 len = 1 + (r>>8)%16;
                I32 bins = (I32)((r>>12) & ((1u<<len)-1));
                CABACputBins(&c, bins, len);
                w1(f,1); w1(f,bins); w1(f,len);
            } else {               // terminate 0
                CABACputTerminate(&c, 0);
                w1(f,2); w1(f,0); w1(f,0);
            }
            w1(f, CABAClen(&c));
        }
        CABACfinish(&c);
        w1(f, c.tmpcnt);
        wu8(f, c.tmpbuf, c.tmpcnt);
        // dump final context values
        wu8(f, (UI8*)&xs, (int)sizeof(ContextSet));
    }
    fclose(f);
}

// ---------------- putCoef vectors ----------------
static void gen_putcoef(const char*path){
    FILE*f=fopen(path,"wb");
    const I32 sizes[4]={4,8,16,32};
    int s,t,i,j;
    int ntest=4*5*6;
    w1(f,ntest);
    for (s=0;s<4;s++) for (t=0;t<30;t++){
        I32 sz=sizes[s];
        I32 qpd6 = t%5;
        I32 pmode = (I32)(xrand()%35);
        static I32 blk[CTU_SZ][CTU_SZ];
        I32 density = 1 + (t%7);     // variable sparsity
        int nonzero = 0;
        for(i=0;i<sz;i++) for(j=0;j<sz;j++){
            unsigned r=xrand();
            I32 v=0;
            if (r% (8/ (density>4?4:density) + 1) == 0) {
                v = (I32)(r>>8)%64 - 32;
                if ((r>>20)%16==0) v = ((I32)(r>>8)%30000) - 15000;  // big escapes
            }
            blk[i][j]=v; if(v) nonzero=1;
        }
        if(!nonzero) blk[sz-1][sz-1]=1;   // putCoef is only called when cbf=1
        CABACcoder c = newCABACcoder();
        ContextSet xs = newContextSet(qpd6);
        putCoef(&c, &xs, sz, CH_Y, pmode, blk);
        w1(f,sz); w1(f,qpd6); w1(f,pmode);
        for(i=0;i<sz;i++) wi32(f,blk[i],sz);
        w1(f, CABAClen(&c));
        CABACfinish(&c);
        w1(f, c.tmpcnt);
        wu8(f, c.tmpbuf, c.tmpcnt);
        wu8(f, (UI8*)&xs, (int)sizeof(ContextSet));
    }
    fclose(f);
}

// ---------------- small full-image streams ----------------
static UI8 gbuf[1<<24], gimg[512*512], grcon[512*512];
static void gen_images(const char*path){
    FILE*f=fopen(path,"wb");
    // synthetic images: gradient+noise, several sizes incl. non multiple of 32
    const I32 hs[5]={32, 64, 96, 50, 128};
    const I32 ws[5]={32, 96, 64, 70, 128};
    int t,q,i,j;
    w1(f, 5*5);
    for(t=0;t<5;t++) for(q=0;q<5;q++){
        I32 ysz=hs[t], xsz=ws[t];
        for(i=0;i<ysz;i++) for(j=0;j<xsz;j++)
            gimg[i*xsz+j] = (UI8)( (i*3+j*2) + (xrand()%64) );
        I32 y2=ysz, x2=xsz;
        memset(grcon, 0xCD, sizeof grcon);
        I32 len = HEVCImageEncoder(gbuf, gimg, grcon, &y2, &x2, q);
        w1(f,ysz); w1(f,xsz); w1(f,q);
        wu8(f, gimg, ysz*xsz);
        w1(f,y2); w1(f,x2);
        w1(f,len);
        wu8(f, gbuf, len);
        wu8(f, grcon, y2*x2);
    }
    fclose(f);
}

int main(int argc, char**argv){
    const char*out = argc>1? argv[1] : ".";
    char p[512];
    sprintf(p,"%s/border.bin",out);  gen_border(p);
    sprintf(p,"%s/predict.bin",out); gen_predict(p);
    sprintf(p,"%s/xform.bin",out);   gen_xform(p);
    sprintf(p,"%s/quant.bin",out);   gen_quant(p);
    sprintf(p,"%s/tables.bin",out);  gen_tables(p);
    sprintf(p,"%s/cabac.bin",out);   gen_cabac(p);
    sprintf(p,"%s/putcoef.bin",out); gen_putcoef(p);
    sprintf(p,"%s/images.bin",out);  gen_images(p);
    printf("done\n");
    return 0;
}
