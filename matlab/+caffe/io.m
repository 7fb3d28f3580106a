classdef io
  % caffe.io — image and mean-file I/O in Caffe's data conventions.
  % matcaffe API parity: matlab/+caffe/io.m.

  methods (Static)
    function im_data = load_image(im_file)
      % im_data = load_image(im_file)
      %   Read an image into gateway layout: single, W x H x C with BGR
      %   channels (width fastest — the transpose of imread's H x W x C
      %   RGB). Grayscale images come back W x H x 1.
      CHECK(ischar(im_file), 'im_file must be a string');
      CHECK_FILE_EXIST(im_file);
      rgb = imread(im_file);
      if size(rgb, 3) == 3
        rgb = rgb(:, :, 3:-1:1);  % RGB -> BGR
      end
      im_data = single(permute(rgb, [2, 1, 3]));
    end

    function mean_data = read_mean(mean_proto_file)
      % mean_data = read_mean(mean_proto_file)
      %   Image mean from a .binaryproto, as W x H x C single (BGR).
      CHECK(ischar(mean_proto_file), 'mean_proto_file must be a string');
      CHECK_FILE_EXIST(mean_proto_file);
      mean_data = caffe_('read_mean', mean_proto_file);
    end

    function write_mean(mean_data, mean_proto_file)
      % write_mean(mean_data, mean_proto_file)
      %   Inverse of read_mean: W x H x C single (BGR) -> .binaryproto.
      CHECK(ischar(mean_proto_file), 'mean_proto_file must be a string');
      CHECK(isa(mean_data, 'single'), 'mean_data must be a SINGLE matrix');
      caffe_('write_mean', mean_data, mean_proto_file);
    end
  end
end
