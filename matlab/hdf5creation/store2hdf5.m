function [curr_dat_sz, curr_lab_sz] = store2hdf5( ...
    filename, data, labels, create, startloc, chunksz)
% Incrementally write (data, labels) batches into one extendible HDF5
% file consumable by the HDF5Data layer. Reference workflow:
% matlab/hdf5creation/store2hdf5.m.
%
%   data     W x H x C x N single-able array (N = samples, MATLAB order)
%   labels   D x N matrix (D label values per sample)
%   create   true: start a fresh file (default); false: append
%   startloc struct('dat', [...], 'lab', [...]) 1-based write offsets;
%            defaults to the start (create) or one past the current end
%            (append)
%   chunksz  samples per HDF5 chunk in create mode (default 1000)
%
% Returns the current /data and /label dataspace sizes.

dat_dims = size(data);
lab_dims = size(labels);
assert(lab_dims(end) == dat_dims(end), ...
  'Number of samples should be matched between data and labels');

if ~exist('create', 'var')
  create = true;
end

if create
  if ~exist('chunksz', 'var')
    chunksz = 1000;
  end
  if exist(filename, 'file')
    fprintf('Warning: replacing existing file %s \n', filename);
    delete(filename);
  end
  % unbounded sample axis: grows with every append
  h5create(filename, '/data', [dat_dims(1:end-1) Inf], ...
    'Datatype', 'single', 'ChunkSize', [dat_dims(1:end-1) chunksz]);
  h5create(filename, '/label', [lab_dims(1:end-1) Inf], ...
    'Datatype', 'single', 'ChunkSize', [lab_dims(1:end-1) chunksz]);
  if ~exist('startloc', 'var')
    startloc.dat = ones(1, numel(dat_dims));
    startloc.lab = ones(1, numel(lab_dims));
  end
else
  if ~exist('startloc', 'var')
    info = h5info(filename);
    prev_dat = info.Datasets(1).Dataspace.Size;
    prev_lab = info.Datasets(2).Dataspace.Size;
    assert(all(prev_dat(1:end-1) == dat_dims(1:end-1)), ...
      'Data dimensions must match existing dimensions in dataset');
    assert(all(prev_lab(1:end-1) == lab_dims(1:end-1)), ...
      'Label dimensions must match existing dimensions in dataset');
    startloc.dat = [ones(1, numel(dat_dims) - 1), prev_dat(end) + 1];
    startloc.lab = [ones(1, numel(lab_dims) - 1), prev_lab(end) + 1];
  end
end

if ~isempty(data)
  h5write(filename, '/data', single(data), startloc.dat, size(data));
  h5write(filename, '/label', single(labels), startloc.lab, size(labels));
end

if nargout
  info = h5info(filename);
  curr_dat_sz = info.Datasets(1).Dataspace.Size;
  curr_lab_sz = info.Datasets(2).Dataspace.Size;
end
end
