function [scores, maxlabel] = classification_demo(im, use_gpu)
% [scores, maxlabel] = classification_demo(im, use_gpu)
%   Image classification through the deepcut_tpu matcaffe binding,
%   mirroring the reference matlab/demo/classification_demo.m workflow:
%   10-crop oversampling of one image through a deploy net, averaged
%   scores, argmax label.
%
%   im       uint8 H x W x 3 RGB image (imread output)
%   use_gpu  1 routes compute to the accelerator backend, 0 to CPU
%
% Needs a deploy prototxt + trained .caffemodel; point the two paths
% below at your model (e.g. a CaffeNet deploy pair from the Model Zoo —
% this rig has no egress, so none ships in-repo). The layout rules are
% the binding's core contract:
%   caffe is row-major N x C x H x W, BGR;
%   MATLAB is column-major, so the SAME bytes are W x H x C x N —
%   load with caffe.io.load_image (or permute as below) and never
%   transpose element-wise.

if exist('../+caffe', 'dir')
  addpath('..');
else
  error('run this demo from the matlab/demo directory');
end

if exist('use_gpu', 'var') && use_gpu
  caffe.set_mode_gpu();
  caffe.set_device(0);
else
  caffe.set_mode_cpu();
end

model_dir = '../../examples/imagenet/';
net = caffe.Net([model_dir 'deploy.prototxt'], ...
                [model_dir 'caffenet.caffemodel'], 'test');

if nargin < 1
  error('pass an image: im = imread(''cat.jpg'');');
end

% stage the 10-crop batch and run one forward
tic;
input_data = {prepare_image(im)};
toc;
tic;
scores = net.forward(input_data);
toc;

scores = mean(scores{1}, 2);   % average over the 10 crops
[~, maxlabel] = max(scores);

caffe.reset_all();

% -------------------------------------------------------------------------
function crops = prepare_image(im)
% RGB H x W x 3 -> W x H x C BGR single, resized to 256, mean-subtracted,
% then the canonical 10 crops (4 corners + centre, each x-mirrored).
IMAGE_DIM = 256;
CROPPED_DIM = 227;

if exist('../+caffe/imagenet/ilsvrc_2012_mean.mat', 'file')
  d = load('../+caffe/imagenet/ilsvrc_2012_mean.mat');  % W x H x C BGR
  mean_data = d.mean_data;
else
  % fall back to the ILSVRC-2012 per-channel means (BGR)
  mean_data = zeros(IMAGE_DIM, IMAGE_DIM, 3, 'single');
  mean_data(:, :, 1) = 104.007;
  mean_data(:, :, 2) = 116.669;
  mean_data(:, :, 3) = 122.679;
end
im_data = single(permute(im(:, :, 3:-1:1), [2, 1, 3]));
im_data = imresize(im_data, [IMAGE_DIM IMAGE_DIM], 'bilinear');
im_data = im_data - mean_data;

crops = zeros(CROPPED_DIM, CROPPED_DIM, 3, 10, 'single');
anchor = [1, IMAGE_DIM - CROPPED_DIM + 1];
n = 1;
for i = anchor
  for j = anchor
    crops(:, :, :, n) = ...
      im_data(i:i + CROPPED_DIM - 1, j:j + CROPPED_DIM - 1, :);
    n = n + 1;
  end
end
c = floor((IMAGE_DIM - CROPPED_DIM) / 2) + 1;
crops(:, :, :, 5) = im_data(c:c + CROPPED_DIM - 1, c:c + CROPPED_DIM - 1, :);
crops(:, :, :, 6:10) = crops(end:-1:1, :, :, 1:5);  % x-axis mirrors
